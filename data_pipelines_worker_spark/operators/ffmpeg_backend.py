"""ffmpeg-backed lossy-media codecs (mp3 / mp4), auto-activated when the
binary exists.

The reference shells out to ffmpeg for every lossy operation; this module
mirrors those exact argument lists (cites per function) behind the same
operator surface `media.py` exposes. Where ffmpeg is absent (this
container), the FIMG/FAUD/FVID + PNG/WAV native paths remain and lossy
payloads hit the honest ``NotImplementedError`` gate — a real deployment
with ffmpeg on the executors gets the reference's actual formats with no
code change.

Execution model: each call spills its payloads to a task-local tmpdir and
reads the products back — bytes stay on the executor (the operators run
inside Arrow-batched pandas UDFs), one short-lived subprocess per payload,
no shared state. Arg construction is split into pure ``*_args`` builders so
the exact ffmpeg command lines are unit-testable without the binary.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import tempfile

FFMPEG = shutil.which("ffmpeg")
HAVE = FFMPEG is not None

#: magic sniffing for the lossy containers the reference traffics in
MP3_MAGIC_ID3 = b"ID3"
MP4_FTYP = b"ftyp"
JPEG_MAGIC = b"\xff\xd8\xff"


def is_mp3(data: bytes) -> bool:
    if data[:3] == MP3_MAGIC_ID3:
        return True
    # bare MPEG audio frame sync: 11 set bits
    return len(data) >= 2 and data[0] == 0xFF and (data[1] & 0xE0) == 0xE0


def is_mp4(data: bytes) -> bool:
    return len(data) >= 12 and data[4:8] == MP4_FTYP


def is_jpeg(data: bytes) -> bool:
    return data[:3] == JPEG_MAGIC


# --- pure arg builders (1:1 with the reference's exec.Command lists) --------


def audio_chunk_args(
    src: str, duration: float, out_pattern: str, drop_video: bool = False
) -> list[str]:
    """block_audio_chunk.go:118-125 — stream-copy segmenter. The reference
    is mp3-in/mp3-out; for our mp4 extension ``drop_video`` adds ``-vn``
    (segments must carry exactly the audio stream)."""
    args = ["-y", "-i", src, "-f", "segment", "-segment_time", f"{duration:f}"]
    if drop_video:
        args += ["-vn"]
    return args + ["-c", "copy", out_pattern]


def audio_convert_args(
    src: str,
    dst: str,
    mono: bool = False,
    sample_rate: int | None = None,
    bit_rate: str | None = None,
) -> list[str]:
    """block_audio_convert.go:115-123 — ``-ac/-ar/-b:a`` transcode."""
    return [
        "-y",
        "-i", src,
        "-ac", "1" if mono else "2",
        "-ar", str(sample_rate or 44100),
        "-b:a", str(bit_rate or "64k"),
        "-preset", "ultrafast",
        dst,
    ]


def video_from_image_args(
    src: str,
    dst: str,
    duration: float,
    fps: int = 30,
    preset: str = "veryfast",
    crf: int = 23,
    format: str = "mp4",
) -> list[str]:
    """block_video_from_image.go:108-120 — looped still → H.264."""
    return [
        "-y",
        "-loop", "1",
        "-t", f"{duration:.3f}",
        "-i", src,
        "-vf", f"fps={fps}",
        "-pix_fmt", "yuv420p",
        "-c:v", "libx264",
        "-preset", preset,
        "-crf", str(crf),
        "-f", format,
        dst,
    ]


def join_videos_args(
    list_file: str, dst: str, re_encode: bool = False, format: str = "mp4"
) -> list[str]:
    """block_join_videos.go:128-152 — concat demuxer, copy or re-encode."""
    args = ["-y", "-f", "concat", "-safe", "0", "-i", list_file]
    if re_encode:
        args += [
            "-c:v", "libx264",
            "-crf", "23",
            "-preset", "veryfast",
            "-pix_fmt", "yuv420p",
            "-f", format,
            "-c:a", "aac",
            "-b:a", "192k",
        ]
    else:
        args += ["-c", "copy"]
    return args + [dst]


def video_add_audio_args(
    video: str, audio: str, dst: str, replace_original_audio: bool = False
) -> list[str]:
    """block_video_add_audio.go:122-140 — map streams, copy video."""
    args = ["-y", "-i", video, "-i", audio]
    args += ["-map", "0:v"] if replace_original_audio else ["-map", "0"]
    return args + ["-map", "1:a", "-c:v", "copy", dst]


def video_add_subtitles_args(
    video: str, subs: str, dst: str, embedding_type: str = "mux"
) -> list[str]:
    """block_video_add_subtitles.go:134-162 — burn (ass filter re-encode)
    or mux (mov_text stream)."""
    args = ["-y", "-i", video]
    if embedding_type == "burn":
        args += ["-vf", f"ass={subs}", "-c:v", "libx264", "-crf", "23", "-preset", "medium"]
    elif embedding_type == "mux":
        args += ["-i", subs, "-c:v", "copy", "-c:s", "mov_text"]
    else:
        raise ValueError("embedding_type must be burn|mux")
    return args + ["-c:a", "copy", dst]


def audio_from_video_args(
    src: str,
    dst: str,
    start: float | None = None,
    end: float | None = None,
    format: str = "mp3",
) -> list[str]:
    """block_audio_from_video.go:103-118 — ``-q:a 0 -map a`` + trim."""
    args = ["-y", "-i", src, "-q:a", "0", "-map", "a", "-f", format]
    if start is not None and start > 0:
        args += ["-ss", f"{start:.3f}"]
    if end is not None and (start is None or end > start) and end > 0:
        args += ["-t", f"{end:.3f}"]
    return args + [dst]


def image_transcode_args(src: str, dst: str) -> list[str]:
    """JPEG→PNG ingest transcode (VERDICT r3 #6): the image2 demuxer/muxer
    picks codecs from the extensions, so a plain ``-i in.jpg out.png`` is
    the whole command — one still image in, one lossless PNG out, which
    then flows through the native zlib+numpy PNG kernels
    (operators/png_codec.py). Mirrors how the reference accepts JPEG at
    every imaging ingress (block_image_resize.go:52-81) without adding a
    second native decoder."""
    return ["-y", "-i", src, dst]


# --- execution --------------------------------------------------------------


class FfmpegError(RuntimeError):
    pass


def _run(args: list[str]) -> None:
    if not HAVE:  # callers gate on HAVE; belt-and-braces
        raise NotImplementedError("ffmpeg binary not found")
    proc = subprocess.run(
        [FFMPEG, *args], capture_output=True, text=True, check=False
    )
    if proc.returncode != 0:
        raise FfmpegError(
            f"ffmpeg failed ({proc.returncode}): {' '.join(args)}\n{proc.stderr[-2000:]}"
        )


def _ext_for(data: bytes) -> str:
    if is_mp3(data):
        return "mp3"
    if is_mp4(data):
        return "mp4"
    if is_jpeg(data):
        return "jpg"
    if data[:4] == b"RIFF":
        return "wav"
    if data[:4] == b"\x89PNG":
        return "png"
    return "bin"


def audio_chunk(audio: bytes, duration: float) -> list[bytes]:
    with tempfile.TemporaryDirectory(prefix="dpws_ff_") as d:
        ext = _ext_for(audio)
        src = os.path.join(d, f"in.{ext}")
        with open(src, "wb") as f:
            f.write(audio)
        # segment container must match the stream-copied codec: mp3 stays
        # mp3 (the reference path); mp4 input copies its AAC into m4a
        # segments with the video stream dropped — "-c copy" into .mp3
        # would be rejected by ffmpeg for AAC input
        seg_ext = "m4a" if ext == "mp4" else "mp3"
        _run(
            audio_chunk_args(
                src,
                duration,
                os.path.join(d, f"segment%03d.{seg_ext}"),
                drop_video=(ext == "mp4"),
            )
        )
        out = []
        for name in sorted(os.listdir(d)):
            if name.startswith("segment"):
                with open(os.path.join(d, name), "rb") as f:
                    out.append(f.read())
        return out


def audio_convert(
    audio: bytes,
    format: str = "mp3",
    mono: bool = False,
    sample_rate: int | None = None,
    bit_rate: str | None = None,
) -> bytes:
    with tempfile.TemporaryDirectory(prefix="dpws_ff_") as d:
        src = os.path.join(d, f"in.{_ext_for(audio)}")
        dst = os.path.join(d, f"out.{format}")
        with open(src, "wb") as f:
            f.write(audio)
        _run(audio_convert_args(src, dst, mono, sample_rate, bit_rate))
        with open(dst, "rb") as f:
            return f.read()


def video_from_image(
    img: bytes,
    duration: float,
    fps: int = 30,
    preset: str = "veryfast",
    crf: int = 23,
    format: str = "mp4",
) -> bytes:
    with tempfile.TemporaryDirectory(prefix="dpws_ff_") as d:
        src = os.path.join(d, f"in.{_ext_for(img)}")
        dst = os.path.join(d, f"out.{format}")
        with open(src, "wb") as f:
            f.write(img)
        _run(video_from_image_args(src, dst, duration, fps, preset, crf, format))
        with open(dst, "rb") as f:
            return f.read()


def join_videos(
    videos: list[bytes], re_encode: bool = False, format: str = "mp4"
) -> bytes:
    with tempfile.TemporaryDirectory(prefix="dpws_ff_") as d:
        paths = []
        for i, v in enumerate(videos):
            p = os.path.join(d, f"part{i:03d}.{_ext_for(v)}")
            with open(p, "wb") as f:
                f.write(v)
            paths.append(p)
        list_file = os.path.join(d, "list.txt")
        with open(list_file, "w") as f:
            for p in paths:
                f.write(f"file '{p}'\n")
        dst = os.path.join(d, f"out.{format}")
        _run(join_videos_args(list_file, dst, re_encode, format))
        with open(dst, "rb") as f:
            return f.read()


def video_add_audio(
    video: bytes, audio: bytes, replace_original_audio: bool = False
) -> bytes:
    with tempfile.TemporaryDirectory(prefix="dpws_ff_") as d:
        v = os.path.join(d, f"v.{_ext_for(video)}")
        a = os.path.join(d, f"a.{_ext_for(audio)}")
        dst = os.path.join(d, "out.mp4")
        for p, data in ((v, video), (a, audio)):
            with open(p, "wb") as f:
                f.write(data)
        _run(video_add_audio_args(v, a, dst, replace_original_audio))
        with open(dst, "rb") as f:
            return f.read()


def video_add_subtitles(
    video: bytes, subtitles: bytes, embedding_type: str = "mux"
) -> bytes:
    with tempfile.TemporaryDirectory(prefix="dpws_ff_") as d:
        v = os.path.join(d, f"v.{_ext_for(video)}")
        s = os.path.join(d, "subs.ass")
        dst = os.path.join(d, "out.mp4")
        with open(v, "wb") as f:
            f.write(video)
        with open(s, "wb") as f:
            f.write(subtitles)
        _run(video_add_subtitles_args(v, s, dst, embedding_type))
        with open(dst, "rb") as f:
            return f.read()


def audio_from_video(
    video: bytes,
    start: float | None = None,
    end: float | None = None,
    format: str = "mp3",
) -> bytes:
    with tempfile.TemporaryDirectory(prefix="dpws_ff_") as d:
        src = os.path.join(d, f"in.{_ext_for(video)}")
        dst = os.path.join(d, f"out.{format}")
        with open(src, "wb") as f:
            f.write(video)
        _run(audio_from_video_args(src, dst, start, end, format))
        with open(dst, "rb") as f:
            return f.read()


def jpeg_to_png(img: bytes) -> bytes:
    """Decode JPEG bytes into PNG via the image2 pipeline (ingest
    normalization for the native PNG kernels)."""
    with tempfile.TemporaryDirectory(prefix="dpws_ff_") as d:
        src = os.path.join(d, "in.jpg")
        dst = os.path.join(d, "out.png")
        with open(src, "wb") as f:
            f.write(img)
        _run(image_transcode_args(src, dst))
        with open(dst, "rb") as f:
            return f.read()
