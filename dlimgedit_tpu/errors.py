"""Error model mirroring the reference.

Reference: dlimg::Exception (/root/reference/src/include/dlimgedit/dlimgedit.hpp:184-191)
and the C-ABI error bridge (/root/reference/src/dlimgedit.cpp:26-40).
"""


class DlimgError(Exception):
    """Base exception for the dlimgedit_tpu library (mirrors dlimg::Exception)."""


class ModelNotFoundError(DlimgError):
    """A required weight bundle is missing from the model directory.

    Mirrors the reference's missing-model exception (session.cpp:80-83).
    """


class UnsupportedImageError(DlimgError):
    """Unsupported channel count / format (image.cpp:19-22)."""
