"""Thread-safe lazy cache, mirroring the reference's Lazy<T>
(/root/reference/src/lazy.hpp:8-18: std::once_flag + std::optional)."""

from __future__ import annotations

import threading
from typing import Callable, Generic, Optional, TypeVar

T = TypeVar("T")


class Lazy(Generic[T]):
    def __init__(self):
        # RLock: a factory that (transitively) re-enters the same Lazy —
        # e.g. a model loader resolving a variant alias through the same
        # registry slot — must recurse instead of deadlocking silently.
        self._lock = threading.RLock()
        self._value: Optional[T] = None
        self._created = False

    def get_or_create(self, factory: Callable[[], T]) -> T:
        if self._created:
            return self._value  # type: ignore[return-value]
        with self._lock:
            if not self._created:
                self._value = factory()
                self._created = True
        return self._value  # type: ignore[return-value]

    @property
    def created(self) -> bool:
        return self._created
