"""Optional native-codec swap behind the stdlib codec contract
(VERDICT r3 item 7).

The repo's image lanes (`operators/multimodal.py`, `operators/jpeg.py`)
are REAL from-scratch codecs — correct, oracle-gated, but per-document
Python work (~2-3 ms/doc for JPEG Huffman+DCT even after einsum
batching). At 100 TB the honest plan swaps the decode kernel for a
native library (PIL / libjpeg-turbo) behind the SAME Arrow stage, the
SAME return contract, and the SAME error behavior, so the swap is a
pure kernel substitution — schema, partitioning, batch shape, and the
driver oracle all unchanged.

This module is that swap point. The sandbox ships no image library
(verified: PIL/cv2/imageio/turbojpeg all absent), so here:

- `HAVE_PIL` gates everything; without PIL every call raises
  `NativeCodecUnavailable` (a loud, typed error — never a silent
  fallback, so a cluster image missing the lib fails fast instead of
  quietly running the 100x-slower pure-Python path).
- `decode_image_native(payload)` returns the EXACT dict contract of
  `multimodal.decode_image_real`: {width, height, channels, maxval,
  pixels: int64 ndarray (h, w, c)} — pixel-identical for the lossless
  formats (netpbm, PNG); JPEG is lossy so the contract there is
  geometry-identical + pixels within IDCT tolerance (the conformance
  test asserts both, and runs only where PIL exists).
- `decode_image_best(payload)` picks native when available, else the
  stdlib codec — the composition the pipeline lanes would use on a
  real cluster.

tests/test_llm_ops.py::test_native_codec_* skip without PIL but pin the
unavailability contract, and run the pixel-equality conformance when a
lib is present.
"""

from __future__ import annotations

try:  # optional dependency — never required in this sandbox
    from PIL import Image  # type: ignore

    HAVE_PIL = True
except ImportError:  # pragma: no cover - exercised in the sandbox
    Image = None  # type: ignore
    HAVE_PIL = False


class NativeCodecUnavailable(RuntimeError):
    """No native image library in this environment; use the stdlib
    codecs (operators/multimodal.py, operators/jpeg.py) or install PIL
    on the cluster image."""


def decode_image_native(payload: bytes) -> dict:
    """Decode netpbm/PNG/JPEG bytes via PIL under the stdlib codec's
    return contract (see module docstring). Raises
    NativeCodecUnavailable without PIL; ValueError on undecodable
    bytes (mirroring the stdlib codecs' loud-error behavior)."""
    if not HAVE_PIL:  # pragma: no cover - PIL absent in the sandbox
        raise NativeCodecUnavailable(str(NativeCodecUnavailable.__doc__))
    import io

    import numpy as np

    try:
        img = Image.open(io.BytesIO(payload))
        img.load()
    except Exception as exc:  # noqa: BLE001 - normalize to the contract
        raise ValueError(f"native decode failed: {exc}") from exc
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.dtype == np.uint16:
        maxval = 65535
    else:
        maxval = 255
    return {"width": img.width, "height": img.height,
            "channels": arr.shape[2], "maxval": maxval,
            "pixels": arr.astype(np.int64)}


def decode_image_best(payload: bytes) -> dict:
    """Native decode when a library is present, stdlib codec otherwise —
    the production composition. Both paths share one return contract, so
    callers (and the driver oracle) cannot tell which kernel ran for the
    lossless formats."""
    if HAVE_PIL:
        return decode_image_native(payload)
    from .multimodal import decode_image_real

    return decode_image_real(payload)
