"""Real-PNG path: codec roundtrip, all five row filters, and the image
blocks (#12-14) over genuine PNG bytes — no Pillow involved.

Fixtures mirror the reference's grid-PNG factory
(test/factories/factories.go:319-354: RGBA(100,100,100,100) fill, black
lines every 50 px)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from data_pipelines_worker_spark.operators import media as M
from data_pipelines_worker_spark.operators import png_codec as P


def grid_png(width: int, height: int) -> bytes:
    """factories.go GetPNGImageBuffer: gray fill, black grid every 50 px."""
    arr = np.full((height, width, 4), 100, dtype=np.uint8)
    arr[:, ::50, :] = [0, 0, 0, 255]
    arr[::50, :, :] = [0, 0, 0, 255]
    return P.png_encode(arr)


class TestCodec:
    @pytest.mark.parametrize("ch", [1, 2, 3, 4])
    def test_roundtrip_all_channel_counts(self, ch):
        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, (23, 17, ch), dtype=np.uint8)
        out = P.png_decode(P.png_encode(arr))
        assert out.shape == arr.shape
        assert np.array_equal(out, arr)

    def test_signature_detection(self):
        assert P.is_png(grid_png(10, 10))
        assert not P.is_png(M.fimg_encode(2, 2, bytes(4)))

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_decode_every_row_filter(self, ftype):
        # hand-encode an RGB image with one fixed filter type per row and
        # check decode recovers the raw pixels — exercises Sub/Up/Average/
        # Paeth, which our own encoder (filter 0) never emits.
        rng = np.random.default_rng(ftype)
        h, w, ch = 9, 11, 3
        arr = rng.integers(0, 256, (h, w, ch), dtype=np.uint8)
        rows = arr.reshape(h, w * ch).astype(np.int32)
        stride = w * ch

        def paeth(a, b, c):
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

        raw = b""
        for y in range(h):
            prior = rows[y - 1] if y else np.zeros(stride, dtype=np.int32)
            filt = bytearray()
            for x in range(stride):
                cur = int(rows[y][x])
                left = int(rows[y][x - ch]) if x >= ch else 0
                up = int(prior[x])
                ul = int(prior[x - ch]) if x >= ch else 0
                pred = {
                    0: 0,
                    1: left,
                    2: up,
                    3: (left + up) // 2,
                    4: paeth(left, up, ul),
                }[ftype]
                filt.append((cur - pred) & 0xFF)
            raw += bytes([ftype]) + bytes(filt)

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert np.array_equal(P.png_decode(png), arr)

    def test_palette_expansion(self):
        # 2-entry palette image → RGB
        pal = bytes([255, 0, 0, 0, 0, 255])  # red, blue
        idx = np.array([[0, 1], [1, 0]], dtype=np.uint8)
        raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(2))

        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", pal)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        arr = P.png_decode(png)
        assert arr.shape == (2, 2, 3)
        assert tuple(arr[0, 0]) == (255, 0, 0) and tuple(arr[0, 1]) == (0, 0, 255)

    def test_interlace_rejected(self):
        def chunk(tag, payload):
            return (
                struct.pack(">I", len(payload))
                + tag
                + payload
                + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
            + chunk(b"IDAT", zlib.compress(b"\x00" * 14))
            + chunk(b"IEND", b"")
        )
        with pytest.raises(NotImplementedError, match="interlaced"):
            P.png_decode(png)


class TestKernels:
    def test_resize_dims_and_content(self):
        png = grid_png(200, 100)
        out = M._png_resize(png, 100, 50)
        arr = P.png_decode(out)
        assert arr.shape == (50, 100, 4)
        # grid lines survive a 2x downscale as darker columns
        assert arr[:, :, :3].mean() < 105

    def test_resize_keep_aspect(self):
        out = M._png_resize(grid_png(200, 100), 100, 999, keep_aspect_ratio=True)
        assert P.png_decode(out).shape == (50, 100, 4)
        # 0-width derives from height (imaging semantics)
        out2 = M._png_resize(grid_png(200, 100), 0, 25)
        assert P.png_decode(out2).shape == (25, 50, 4)

    def test_blur_reduces_variance_keeps_mean(self):
        png = grid_png(120, 80)
        before = P.png_decode(png)[:, :, 0].astype(float)
        after = P.png_decode(M._png_blur(png, 2.0))[:, :, 0].astype(float)
        assert after.shape == before.shape
        assert after.var() < before.var() * 0.7
        assert abs(after.mean() - before.mean()) < 3.0

    def test_add_text_stamps_anchored_block(self):
        png = grid_png(160, 120)
        out = P.png_decode(
            M._png_add_text(png, "HELLO", font_size=14, text_position="top-left", margin=4)
        )
        # bg rect (255) and glyph ink (0) both present near the anchor
        region = out[4:30, 4:80, 0]
        assert (region == 255).any() and (region == 0).any()
        # untouched off-gridline pixel keeps the fill value
        assert out[115, 155, 0] == 100

    def test_add_text_rejects_bad_anchor(self):
        with pytest.raises(ValueError, match="text_position"):
            M._png_add_text(grid_png(20, 20), "x", text_position="middle")

    def test_wordwrap_multiline(self):
        arr = np.full((200, 60, 3), 200, dtype=np.uint8)
        out = P.render_text(arr, "AAA BBB CCC", font_size=7, text_position="center")
        # 60px wide / 6px per glyph = 10 cols → wraps into 2+ lines → block
        # taller than one 8px line
        ys = np.where((out[:, :, 0] == 0).any(axis=1))[0]
        assert ys.max() - ys.min() > 8


class TestSparkOps:
    def test_image_resize_real_png_through_spark(self, spark):
        df = spark.createDataFrame(
            [(0, grid_png(100, 60))], "input_index long, payload_bin binary"
        )
        rows = M.image_resize(df, 50, 30).collect()
        arr = P.png_decode(bytes(rows[0].payload_bin))
        assert arr.shape == (30, 50, 4)
        assert rows[0].mime == "image/png"

    def test_mixed_fake_and_real_batch(self, spark):
        df = spark.createDataFrame(
            [(0, grid_png(40, 40)), (1, M.fimg_encode(8, 8, bytes(64)))],
            "input_index long, payload_bin binary",
        )
        rows = M.image_blur(df, 1.0).orderBy("input_index").collect()
        assert P.is_png(bytes(rows[0].payload_bin))
        assert bytes(rows[1].payload_bin)[:4] == M.FIMG_MAGIC

    def test_jpeg_still_raises_honest_stub(self, spark):
        if M._HAVE_PIL:
            pytest.skip("Pillow present; real path would handle it")
        with pytest.raises(Exception, match="Pillow"):
            M.image_resize_bytes  # kernel level
            df = spark.createDataFrame(
                [(0, b"\xff\xd8\xff\xe0fakejpeg")], "input_index long, payload_bin binary"
            )
            M.image_resize(df, 10, 10).collect()


class TestTextStyle:
    def test_font_and_bg_colors(self):
        arr = np.full((60, 80, 3), 100, dtype=np.uint8)
        out = P.render_text(
            arr, "HI", font_size=14, text_position="center",
            color="#FF0000", bg="#00FF00",
        )
        # glyph ink is pure red, rect is pure green
        assert (np.all(out == [255, 0, 0], axis=2)).any()
        assert (np.all(out == [0, 255, 0], axis=2)).any()

    def test_bg_alpha_blend(self):
        arr = np.full((40, 60, 3), 100, dtype=np.uint8)
        out = P.render_text(
            arr, "A", font_size=7, text_position="center",
            color=0, bg=200, bg_alpha=0.5,
        )
        # 50% blend of 200 over 100 = 150 in the rect, outside untouched
        assert (out == 150).any()
        assert out[0, 0, 0] == 100

    def test_bg_all_width_spans_image(self):
        arr = np.full((40, 100, 3), 50, dtype=np.uint8)
        out = P.render_text(
            arr, "X", font_size=7, text_position="center",
            color=0, bg=255, bg_all_width=True,
        )
        band_rows = np.where((out[:, 0, 0] == 255))[0]
        assert len(band_rows) > 0  # rect reaches column 0 = full width

    def test_color_parsing(self):
        assert P.parse_color("#abc", None) == (0xAA, 0xBB, 0xCC)
        assert P.parse_color("112233", None) == (0x11, 0x22, 0x33)
        assert P.parse_color(7, None) == (7, 7, 7)
        assert P.parse_color((1, 2, 3), None) == (1, 2, 3)
        assert P.parse_color(None, (9, 9, 9)) == (9, 9, 9)

    def test_full_style_through_compiled_block(self, spark, tmp_path):
        from data_pipelines_worker_spark.plans.compiler import (
            BlockSpec, InputBinding, PipelineRunner, PipelineSpec,
        )

        runner = PipelineRunner(spark, str(tmp_path))
        spec = PipelineSpec(
            slug="styled",
            blocks=[
                BlockSpec(id="upload_file", slug="up", fan_out=True),
                BlockSpec(
                    id="image_add_text",
                    slug="titled",
                    input={
                        "text": "GO", "font_size": 14, "text_position": "top-left",
                        "font_color": "#0000FF", "text_bg_color": "#FFFF00",
                        "text_bg_alpha": 1.0, "text_bg_margin": 2,
                        "text_bg_all_width": True,
                    },
                    bindings=[InputBinding(param="image", origin="up", binary=True)],
                ),
            ],
        )
        res = runner.run(spec, request_input={"up": {"file": [grid_png(64, 40)]}})
        arr = P.png_decode(bytes(res.output.first().payload_bin))
        assert (np.all(arr[:, :, :3] == [0, 0, 255], axis=2)).any()   # blue ink
        assert (np.all(arr[:, :, :3] == [255, 255, 0], axis=2)).any() # yellow bg
        # all_width: the bg band reaches the right edge
        assert (np.all(arr[:, -1, :3] == [255, 255, 0], axis=1)).any()
