"""Core value types mirroring the reference public API.

Reference: /root/reference/src/include/dlimgedit/dlimgedit.hpp:23-135
(Extent, Channels, ImageView, Image, Backend, Options, Point, Region).

These are plain Python dataclasses — the TPU-native rebuild keeps the same
public vocabulary so the C++14 header can sit on top unchanged.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass
from typing import Optional, Union

import numpy as np

__all__ = [
    "Extent",
    "Channels",
    "channel_count",
    "ImageView",
    "Image",
    "Backend",
    "Options",
    "Point",
    "Region",
]


@dataclass(frozen=True)
class Extent:
    """Resolution of an image or size of an image region (dlimgedit.hpp:23)."""

    width: int = 0
    height: int = 0

    def __iter__(self):
        yield self.width
        yield self.height


class Channels(enum.Enum):
    """Channel order of image pixels; each channel is 1 byte (dlimgedit.hpp:29).

    The enum values for mask/rgb/rgba match the reference's numeric values
    (1, 3, 4); bgra/argb are 4-channel orders with distinct tags.
    """

    mask = 1
    rgb = 3
    rgba = 4
    bgra = 5
    argb = 6


def channel_count(channels: Channels) -> int:
    """Number of channels for a pixel (dlimgedit.hpp:32 ``count``)."""
    if channels in (Channels.rgba, Channels.bgra, Channels.argb):
        return 4
    return channels.value


# Channel index maps used to extract RGB from any supported order.
# Reference: create_image_tensor, /root/reference/src/segmentation.cpp:81-97.
RGB_CHANNEL_MAP = {
    Channels.mask: (0, 0, 0),
    Channels.rgb: (0, 1, 2),
    Channels.rgba: (0, 1, 2),
    Channels.bgra: (2, 1, 0),
    Channels.argb: (1, 2, 3),
}


@dataclass
class ImageView:
    """Read-only view of packed row-major uint8 pixel data (dlimgedit.hpp:36).

    ``pixels`` is a numpy array of shape (height, width, channel_count) or
    (height, width) for masks. The view does not copy.
    """

    pixels: np.ndarray
    extent: Extent
    channels: Channels = Channels.rgba

    @staticmethod
    def from_array(arr: np.ndarray, channels: Optional[Channels] = None) -> "ImageView":
        if arr.dtype != np.uint8:
            raise ValueError(f"ImageView requires uint8 pixels, got {arr.dtype}")
        if arr.ndim == 2:
            arr = arr[:, :, None]
        h, w, c = arr.shape
        if channels is None:
            channels = {1: Channels.mask, 3: Channels.rgb, 4: Channels.rgba}.get(c)
            if channels is None:
                raise ValueError(f"Unsupported number of channels ({c})")
        if channel_count(channels) != c:
            raise ValueError(
                f"channels={channels} expects {channel_count(channels)} planes, got {c}"
            )
        return ImageView(pixels=arr, extent=Extent(w, h), channels=channels)


class Image:
    """An image owning packed uint8 pixel data (dlimgedit.hpp:48-84)."""

    def __init__(self, extent: Extent, channels: Channels = Channels.rgba,
                 pixels: Optional[np.ndarray] = None):
        self._extent = extent
        self._channels = channels
        c = channel_count(channels)
        if pixels is None:
            pixels = np.empty((extent.height, extent.width, c), dtype=np.uint8)
        else:
            if np.asarray(pixels).dtype != np.uint8:
                # Mirror ImageView.from_array: a silent cast would WRAP
                # int16 values and floor a float [0, 1] mask to all-zeros.
                raise ValueError(
                    f"Image pixels must be uint8 (got "
                    f"{np.asarray(pixels).dtype}); scale/convert explicitly")
            pixels = np.ascontiguousarray(pixels)
            if pixels.ndim == 2:
                pixels = pixels[:, :, None]
            if pixels.shape != (extent.height, extent.width, c):
                raise ValueError(
                    f"pixel buffer shape {pixels.shape} does not match "
                    f"extent {extent} x {c} channels"
                )
        self._pixels = pixels

    @property
    def extent(self) -> Extent:
        return self._extent

    @property
    def channels(self) -> Channels:
        return self._channels

    @property
    def pixels(self) -> np.ndarray:
        return self._pixels

    @property
    def size(self) -> int:
        """Size in bytes (dlimgedit.hpp:56)."""
        return self._pixels.nbytes

    def view(self) -> ImageView:
        return ImageView(self._pixels, self._extent, self._channels)

    @staticmethod
    def load(filepath) -> "Image":
        from .image.io import load_image

        return load_image(str(filepath))

    def save(img: Union["Image", ImageView], filepath) -> None:  # noqa: N805
        """Write a PNG. Deliberately NOT a @staticmethod so that BOTH
        spellings work: ``img.save(path)`` (the natural instance call, where
        ``img`` binds self) and ``Image.save(img_or_view, path)`` (the
        C++-header-mirroring form)."""
        from .image.io import save_image

        save_image(img if isinstance(img, ImageView) else img.view(),
                   str(filepath))


class Backend(enum.Enum):
    """Hardware backend (dlimgedit.hpp:89). ``gpu`` maps to the accelerator
    platform (TPU in this build); ``cpu`` maps to the JAX CPU platform."""

    cpu = 0
    gpu = 1
    tpu = 1  # alias: the accelerator backend of this build *is* the TPU


@dataclass
class Options:
    """Inference options (dlimgedit.hpp:91-96).

    ``model_directory`` holds converted weight bundles (.npz / orbax) instead
    of the reference's .onnx files. ``allow_random_weights`` lets the
    environment fall back to deterministic random-initialised weights when no
    bundle is present (used by tests and benchmarking without checkpoints).
    """

    backend: Backend = Backend.cpu
    model_directory: str = "models"
    allow_random_weights: bool = False
    # Compute dtype for encoder forward passes. bf16 is the TPU-native choice.
    compute_dtype: str = "bfloat16"
    # SAM encoder variant: mobile_sam (reference default) / vit_b / vit_l / vit_h.
    sam_variant: str = "mobile_sam"
    # Model input resolution (1024 for all shipped SAM variants).
    sam_image_size: int = 1024
    # For Region prompts: keep only the largest connected object in the box
    # (north-star extension; the reference returns the raw box-prompt mask).
    largest_region_object: bool = False
    # Record per-executable call latencies (Environment.profiler.report()).
    enable_profiling: bool = False
    # Weight-only int8 quantisation of encoder projection weights
    # (ops/quant.py) — halves encoder weight memory/bandwidth.
    quantize_encoder: bool = False
    # Additionally quantise activations (dynamic per-token int8) so encoder
    # projections run s8 x s8 on the MXU — 2x MXU throughput on v5e.
    # Implies quantize_encoder (int8 weights).
    quantize_activations: bool = False
    # BiRefNet: gather deformable-sampling taps from an int8-quantised
    # corner stack, a bounded mask approximation (parity test caps the
    # deviation). As of round 4 this is NOT recommended at any resolution:
    # the row-banded tap loop (ops/deform._BAND_PIXELS) keeps the gather
    # pipeline fused, making fetched bytes cheap, and the quantise/
    # dequantise overhead measured a net LOSS on chip at @1024 (78.4 vs
    # 71.9 ms) and @2048 (409.9 vs 404.7) — BENCH_NOTES round 4. Kept for
    # API stability and as the knob to re-evaluate on future hardware.
    birefnet_int8_deform: bool = False
    # Preprocess resize: "device" (fused antialiased bilinear on TPU — the
    # fast path, matches SAM upstream semantics) or "host" (stb-semantics
    # sRGB Mitchell/Catmull-Rom resize on CPU — the reference's exact
    # numerics, image.cpp:37-51; the device program then only normalises).
    preprocess_mode: str = "device"
    # H2D pipelining: pack the input canvas in row chunks and issue each
    # chunk's async device_put before packing the next, hiding the host
    # pack behind the previous chunk's DMA. 0 = auto (4 chunks on
    # co-located TPU; 1 — the single-put baseline — on CPU and through
    # the axon relay, where per-put RPC overhead outweighs the overlap).
    h2d_overlap_chunks: int = 0
    # Persistent XLA compilation cache directory. When set, every jitted
    # executable is AOT-serialised here on first compile and reloaded on
    # later runs/processes — the deployment analog of the reference shipping
    # pre-built ONNX graphs (first-call latency drops from ~seconds of
    # compilation to cache-read time). Pre-fill with tools/aot_warmup.py.
    compilation_cache_dir: Optional[str] = None
    # Single-image latency scale-out across the backend's devices: 1 (the
    # default) keeps today's single-device path; 0 = all devices of the
    # selected backend; N >= 2 = that many. When the resulting mesh has
    # >= 2 devices, Environment routes the heavy encoders through the
    # latency tiers — ViT SAM variants via the sequence-parallel encoder
    # (parallel/sp.py: window-sharded residual stream, all_gather only at
    # global blocks) and TinyViT/BiRefNet via GSPMD canvas-row sharding
    # (parallel/spatial.py's scheme: convs/window attention stay row-local
    # with halo exchanges) — numerically identical to the single-device
    # programs (tests/test_scaleout.py). Falls back to the single-device
    # path when fewer than 2 devices exist, so serving configs can set 0
    # unconditionally.
    scaleout_devices: int = 1


@dataclass(frozen=True)
class Point:
    """A point in image pixel coordinates, origin top-left (dlimgedit.hpp:119)."""

    x: int = 0
    y: int = 0


@dataclass(frozen=True)
class Region:
    """A rectangular region in image pixel coordinates (dlimgedit.hpp:125)."""

    top_left: Point
    bottom_right: Point

    @staticmethod
    def from_origin_extent(origin: Point, extent: Extent) -> "Region":
        return Region(origin, Point(origin.x + extent.width, origin.y + extent.height))

    @property
    def extent(self) -> Extent:
        return Extent(
            self.bottom_right.x - self.top_left.x,
            self.bottom_right.y - self.top_left.y,
        )
