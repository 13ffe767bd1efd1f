"""Real PNG codec + image kernels — stdlib ``zlib`` and numpy only.

The reference processes real PNGs through disintegration/imaging
(block_image_resize.go:80 Lanczos resize, block_image_blur.go:80 gaussian,
block_image_add_text.go:192-267 wrapped text with bg rect). Pillow/ffmpeg
are not installed here, but PNG itself needs nothing beyond DEFLATE
(stdlib ``zlib``) and per-row filters — so real PNG payloads get a real
path: decode → numpy array → vectorized kernel → encode.

Supported: bit depth 8, color types 0 (gray), 2 (RGB), 3 (palette),
4 (gray+alpha), 6 (RGBA), non-interlaced. Interlaced (Adam7) and 16-bit
inputs raise a clear error — at pipeline scale those are re-encoded at
ingest, not handled per-operator.

Kernel fidelity vs the reference:

- resize: bilinear (deterministic, vectorized). Lanczos differs per-pixel;
  structural contracts (dims, aspect handling) are identical.
- blur: true separable gaussian, kernel radius ceil(3σ) — same shape as
  imaging.Blur.
- add_text: deterministic 5×7 bitmap font with word-wrap, the 9 anchors of
  block_image_add_text.go:126-157 and an opaque bg rect — structurally
  equivalent (text region provably stamped), not glyph-identical to
  truetype.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

#: channels per PNG color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def is_png(data: bytes) -> bool:
    return data[:8] == _PNG_SIG


def _chunks(data: bytes):
    pos = 8
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        yield tag, data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + tag + payload + crc
        if tag == b"IEND":
            break


def png_decode(data: bytes) -> np.ndarray:
    """PNG bytes → uint8 array of shape (h, w, channels).

    Palette images are expanded to RGB (plus alpha when a tRNS chunk is
    present); all other color types keep their channel count.
    """
    if not is_png(data):
        raise ValueError("not a PNG payload")
    ihdr = None
    idat = []
    plte = trns = None
    for tag, payload in _chunks(data):
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"PLTE":
            plte = payload
        elif tag == b"tRNS":
            trns = payload
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} unsupported (8 only)")
    if ctype not in _CHANNELS:
        raise ValueError(f"PNG color type {ctype} invalid")
    if interlace:
        raise NotImplementedError("interlaced (Adam7) PNG unsupported")
    ch = _CHANNELS[ctype]
    raw = zlib.decompress(b"".join(idat))
    stride = w * ch
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    raw = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes, rows = raw[:, 0], raw[:, 1:]
    out = np.zeros((h, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    # Vectorization (real-world encoders emit filters 1-4 heavily — a
    # per-byte Python loop on a 1080p RGBA frame is ~8M interpreted
    # iterations): Sub is an exact per-channel prefix sum mod 256 (full
    # numpy cumsum, no loop); Up is pure vector; Average/Paeth carry a
    # true sequential dependence on the defiltered left pixel, so they
    # loop over the w *pixels* but compute all channels per step — w
    # numpy ops per row instead of w*ch interpreted byte ops.
    for y in range(h):
        cur = rows[y].copy()
        prior = out[y - 1] if y else zero_row
        ft = ftypes[y]
        if ft == 0:
            out[y] = cur
        elif ft == 1:  # Sub — per-channel cumsum mod 256
            out[y] = (
                np.cumsum(cur.reshape(w, ch), axis=0, dtype=np.uint64)
                .astype(np.uint8)
                .reshape(stride)
            )
        elif ft == 2:  # Up
            out[y] = cur + prior
        elif ft == 3:  # Average — sequential in pixels, vector in channels
            curp = cur.reshape(w, ch).astype(np.int16)
            priorp = prior.reshape(w, ch).astype(np.int16)
            left = np.zeros(ch, dtype=np.int16)
            for i in range(w):
                left = (curp[i] + (left + priorp[i]) // 2) & 0xFF
                curp[i] = left
            out[y] = curp.astype(np.uint8).reshape(stride)
        elif ft == 4:  # Paeth — sequential in pixels, vector in channels
            curp = cur.reshape(w, ch).astype(np.int16)
            priorp = prior.reshape(w, ch).astype(np.int16)
            a = np.zeros(ch, dtype=np.int16)  # defiltered left pixel
            c = np.zeros(ch, dtype=np.int16)  # prior-row left pixel
            for i in range(w):
                b = priorp[i]
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                a = (curp[i] + pred) & 0xFF
                curp[i] = a
                c = b
            out[y] = curp.astype(np.uint8).reshape(stride)
        else:
            raise ValueError(f"PNG filter type {ft} invalid")
    arr = out.reshape(h, w, ch)
    if ctype == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = arr[:, :, 0]
        rgb = pal[idx]
        if trns is not None:
            alpha = np.full(256, 255, dtype=np.uint8)
            alpha[: len(trns)] = np.frombuffer(trns, dtype=np.uint8)
            arr = np.dstack([rgb, alpha[idx]])
        else:
            arr = rgb
    return arr


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray) -> bytes:
    """uint8 (h, w) or (h, w, channels) array → PNG bytes (filter 0 rows)."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    body = np.ascontiguousarray(arr, dtype=np.uint8).reshape(h, w * ch)
    raw = b"".join(b"\x00" + body[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


# --- kernels ----------------------------------------------------------------


def resize_bilinear(arr: np.ndarray, width: int, height: int) -> np.ndarray:
    """Vectorized bilinear resample (pixel-center aligned)."""
    h, w = arr.shape[:2]
    if (w, h) == (width, height):
        return arr.copy()
    # source coordinate of each output pixel center
    xs = (np.arange(width) + 0.5) * w / width - 0.5
    ys = (np.arange(height) + 0.5) * h / height - 0.5
    x0 = np.clip(np.floor(xs).astype(int), 0, w - 1)
    y0 = np.clip(np.floor(ys).astype(int), 0, h - 1)
    x1, y1 = np.minimum(x0 + 1, w - 1), np.minimum(y0 + 1, h - 1)
    fx = np.clip(xs - x0, 0.0, 1.0)[None, :, None]
    fy = np.clip(ys - y0, 0.0, 1.0)[:, None, None]
    a = arr[np.ix_(y0, x0)].astype(np.float32)
    b = arr[np.ix_(y0, x1)].astype(np.float32)
    c = arr[np.ix_(y1, x0)].astype(np.float32)
    d = arr[np.ix_(y1, x1)].astype(np.float32)
    top = a + (b - a) * fx
    bot = c + (d - c) * fx
    out = top + (bot - top) * fy
    return np.clip(np.rint(out), 0, 255).astype(np.uint8)


def gaussian_blur(arr: np.ndarray, sigma: float) -> np.ndarray:
    """Separable gaussian, radius ceil(3σ), edge-clamped."""
    if sigma <= 0:
        return arr.copy()
    r = max(1, int(np.ceil(3.0 * sigma)))
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x**2) / (2.0 * sigma * sigma))
    k /= k.sum()
    f = arr.astype(np.float64)
    pad = np.pad(f, ((0, 0), (r, r), (0, 0)), mode="edge")
    f = sum(k[i] * pad[:, i : i + arr.shape[1]] for i in range(2 * r + 1))
    pad = np.pad(f, ((r, r), (0, 0), (0, 0)), mode="edge")
    f = sum(k[i] * pad[i : i + arr.shape[0]] for i in range(2 * r + 1))
    return np.clip(np.rint(f), 0, 255).astype(np.uint8)


# 5×7 bitmap font: printable ASCII subset, each glyph 5 columns × 7 rows,
# encoded as 7 row-bitmasks (bit 4 = leftmost column). Deterministic and
# dependency-free; unknown glyphs render as the filled box.
_FONT: dict[str, tuple[int, ...]] = {
    " ": (0, 0, 0, 0, 0, 0, 0),
    "A": (0b01110, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "B": (0b11110, 0b10001, 0b10001, 0b11110, 0b10001, 0b10001, 0b11110),
    "C": (0b01110, 0b10001, 0b10000, 0b10000, 0b10000, 0b10001, 0b01110),
    "D": (0b11110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b11110),
    "E": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b11111),
    "F": (0b11111, 0b10000, 0b10000, 0b11110, 0b10000, 0b10000, 0b10000),
    "G": (0b01110, 0b10001, 0b10000, 0b10111, 0b10001, 0b10001, 0b01111),
    "H": (0b10001, 0b10001, 0b10001, 0b11111, 0b10001, 0b10001, 0b10001),
    "I": (0b01110, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "J": (0b00111, 0b00010, 0b00010, 0b00010, 0b00010, 0b10010, 0b01100),
    "K": (0b10001, 0b10010, 0b10100, 0b11000, 0b10100, 0b10010, 0b10001),
    "L": (0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b10000, 0b11111),
    "M": (0b10001, 0b11011, 0b10101, 0b10101, 0b10001, 0b10001, 0b10001),
    "N": (0b10001, 0b11001, 0b10101, 0b10011, 0b10001, 0b10001, 0b10001),
    "O": (0b01110, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "P": (0b11110, 0b10001, 0b10001, 0b11110, 0b10000, 0b10000, 0b10000),
    "Q": (0b01110, 0b10001, 0b10001, 0b10001, 0b10101, 0b10010, 0b01101),
    "R": (0b11110, 0b10001, 0b10001, 0b11110, 0b10100, 0b10010, 0b10001),
    "S": (0b01111, 0b10000, 0b10000, 0b01110, 0b00001, 0b00001, 0b11110),
    "T": (0b11111, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0b00100),
    "U": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01110),
    "V": (0b10001, 0b10001, 0b10001, 0b10001, 0b10001, 0b01010, 0b00100),
    "W": (0b10001, 0b10001, 0b10001, 0b10101, 0b10101, 0b11011, 0b10001),
    "X": (0b10001, 0b10001, 0b01010, 0b00100, 0b01010, 0b10001, 0b10001),
    "Y": (0b10001, 0b10001, 0b01010, 0b00100, 0b00100, 0b00100, 0b00100),
    "Z": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b10000, 0b11111),
    "0": (0b01110, 0b10001, 0b10011, 0b10101, 0b11001, 0b10001, 0b01110),
    "1": (0b00100, 0b01100, 0b00100, 0b00100, 0b00100, 0b00100, 0b01110),
    "2": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0b01000, 0b11111),
    "3": (0b11111, 0b00010, 0b00100, 0b00010, 0b00001, 0b10001, 0b01110),
    "4": (0b00010, 0b00110, 0b01010, 0b10010, 0b11111, 0b00010, 0b00010),
    "5": (0b11111, 0b10000, 0b11110, 0b00001, 0b00001, 0b10001, 0b01110),
    "6": (0b00110, 0b01000, 0b10000, 0b11110, 0b10001, 0b10001, 0b01110),
    "7": (0b11111, 0b00001, 0b00010, 0b00100, 0b01000, 0b01000, 0b01000),
    "8": (0b01110, 0b10001, 0b10001, 0b01110, 0b10001, 0b10001, 0b01110),
    "9": (0b01110, 0b10001, 0b10001, 0b01111, 0b00001, 0b00010, 0b01100),
    ".": (0, 0, 0, 0, 0, 0b00100, 0b00100),
    ",": (0, 0, 0, 0, 0b00100, 0b00100, 0b01000),
    "!": (0b00100, 0b00100, 0b00100, 0b00100, 0b00100, 0, 0b00100),
    "?": (0b01110, 0b10001, 0b00001, 0b00010, 0b00100, 0, 0b00100),
    "-": (0, 0, 0, 0b11111, 0, 0, 0),
    ":": (0, 0b00100, 0b00100, 0, 0b00100, 0b00100, 0),
    "'": (0b00100, 0b00100, 0, 0, 0, 0, 0),
}
_FALLBACK = (0b11111,) * 7


def _glyph(ch: str) -> tuple[int, ...]:
    return _FONT.get(ch.upper(), _FALLBACK)


def _wrap_lines(text: str, max_cols: int) -> list[str]:
    """Word-wrap to ``max_cols`` glyphs per line (word-wrap + bg rect
    renderer shape, block_image_add_text.go:192-267)."""
    lines: list[str] = []
    for para in text.split("\n"):
        cur = ""
        for word in para.split(" "):
            cand = word if not cur else cur + " " + word
            if len(cand) <= max_cols or not cur:
                cur = cand
            else:
                lines.append(cur)
                cur = word
        lines.append(cur)
    return lines or [""]


def parse_color(value, default):
    """'#RRGGBB' / '#RGB' / int / (r, g, b) → (r, g, b) tuple."""
    if value is None:
        return default
    if isinstance(value, (tuple, list)):
        return tuple(int(c) for c in value[:3])
    if isinstance(value, (int, float)):
        v = int(value)
        return (v, v, v)
    s = str(value).lstrip("#")
    if len(s) == 3:
        s = "".join(c * 2 for c in s)
    return tuple(int(s[i : i + 2], 16) for i in (0, 2, 4))


def render_text(
    arr: np.ndarray,
    text: str,
    font_size: int = 12,
    text_position: str = "center",
    margin: int = 0,
    color=0,
    bg=255,
    bg_alpha: float = 1.0,
    bg_all_width: bool = False,
) -> np.ndarray:
    """Stamp wrapped bitmap text onto a copy of ``arr``.

    ``font_size`` is the glyph pixel height (scale = font_size // 7, min 1);
    the 9 anchors mirror block_image_add_text.go:126-157. ``color``/``bg``
    accept '#RRGGBB', grayscale ints, or RGB tuples (font_color /
    text_bg_color, :184-186); ``bg`` None = no rect. ``bg_alpha`` blends
    the rect over the image (text_bg_alpha :187); ``bg_all_width`` spans
    the rect across the full image width (text_bg_all_width :189).
    """
    h, w = arr.shape[:2]
    scale = max(1, font_size // 7)
    gw, gh = 6 * scale, 8 * scale  # glyph cell incl. 1-unit spacing
    max_cols = max(1, (w - 2 * margin) // gw)
    lines = _wrap_lines(text, max_cols)
    block_w = max(len(ln) for ln in lines) * gw
    block_h = len(lines) * gh
    vert, _, horiz = text_position.partition("-")
    if text_position == "center":
        vert, horiz = "center", "center"
    x0 = {
        "left": margin,
        "center": (w - block_w) // 2,
        "right": w - block_w - margin,
    }[horiz or "center"]
    y0 = {
        "top": margin,
        "center": (h - block_h) // 2,
        "bottom": h - block_h - margin,
    }[vert]
    x0, y0 = max(0, min(x0, w - 1)), max(0, min(y0, h - 1))
    out = arr.copy()
    ch = out.shape[2] if out.ndim == 3 else 1
    fg_rgb = parse_color(color, (0, 0, 0))
    bg_rgb = None if bg is None else parse_color(bg, (255, 255, 255))

    def paint(ya, yb, xa, xb, rgb, alpha=1.0):
        region = out[ya:yb, xa:xb]
        if region.size == 0:
            return
        if ch >= 3:
            val = np.array(rgb, dtype=np.float64)
            blended = (1.0 - alpha) * region[:, :, :3].astype(np.float64) + alpha * val
            out[ya:yb, xa:xb, :3] = np.clip(np.rint(blended), 0, 255).astype(np.uint8)
        else:
            gray = sum(rgb) / 3.0
            blended = (1.0 - alpha) * region[:, :, 0].astype(np.float64) + alpha * gray
            out[ya:yb, xa:xb, 0] = np.clip(np.rint(blended), 0, 255).astype(np.uint8)

    if bg_rgb is not None:
        y1 = min(h, y0 + block_h)
        bx0, bx1 = (0, w) if bg_all_width else (x0, min(w, x0 + block_w))
        paint(y0, y1, bx0, bx1, bg_rgb, max(0.0, min(1.0, bg_alpha)))
    for li, line in enumerate(lines):
        for ci, c in enumerate(line):
            rows = _glyph(c)
            gx, gy = x0 + ci * gw, y0 + li * gh
            for ry, mask in enumerate(rows):
                for rx in range(5):
                    if mask & (1 << (4 - rx)):
                        ya, xa = gy + ry * scale, gx + rx * scale
                        yb, xb = min(h, ya + scale), min(w, xa + scale)
                        if ya < h and xa < w:
                            paint(ya, yb, xa, xb, fg_rgb)
    return out
