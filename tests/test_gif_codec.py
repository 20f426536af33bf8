"""Real GIF codec: LZW roundtrips (incl. width growth, table-fill CLEAR
reset, KwKwK self-reference), palettization limits, corruption isolation,
and container parity through the ImageFeatures actor stage."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from invoice_ocr_reconciler_ray.functions.gif import (
    GIF_MAGIC,
    decode_gif,
    encode_gif,
)


def _pal_image(rng, h, w, ncol):
    pal = rng.randint(0, 256, (ncol, 3), dtype=np.uint8)
    return pal[rng.randint(0, ncol, (h, w))]


def test_gif_roundtrip_various_shapes_and_palettes():
    rng = np.random.RandomState(11)
    for h, w, ncol in [(1, 1, 1), (3, 5, 2), (16, 16, 4), (13, 29, 7), (40, 40, 256)]:
        arr = _pal_image(rng, h, w, ncol)
        dec = decode_gif(encode_gif(arr))
        assert dec.shape == arr.shape and (dec == arr).all()


def test_gif_lzw_width_growth_and_clear_reset():
    # 60k random 8-bit pixels force the code width through 9..12 bits and
    # past the 4096-entry table cap (the encoder must emit CLEAR + reset)
    rng = np.random.RandomState(3)
    arr = _pal_image(rng, 200, 300, 256)
    enc = encode_gif(arr)
    assert (decode_gif(enc) == arr).all()


def test_gif_lzw_kwkwk_self_reference():
    # a run of one repeated index is the classic code==next_code case
    pal = np.array([[10, 20, 30], [200, 100, 0]], dtype=np.uint8)
    idx = np.zeros((4, 64), dtype=np.int64)
    idx[:, ::7] = 1
    arr = pal[idx]
    assert (decode_gif(encode_gif(arr)) == arr).all()


def test_gif_compresses_repetitive_rasters():
    pal = np.arange(24, dtype=np.uint8).reshape(8, 3)
    idx = (np.arange(200 * 300) % 17 // 3).reshape(200, 300)
    arr = pal[idx]
    enc = encode_gif(arr)
    assert len(enc) < 200 * 300 // 10  # real LZW, not a stored format
    assert (decode_gif(enc) == arr).all()


def test_gif_rejects_true_color_and_corruption():
    rng = np.random.RandomState(1)
    with pytest.raises(ValueError):
        encode_gif(rng.randint(0, 256, (40, 40, 3), dtype=np.uint8))  # >256 colors
    arr = _pal_image(rng, 8, 8, 4)
    enc = encode_gif(arr)
    with pytest.raises(ValueError):
        decode_gif(b"NOTAGIF" + enc)
    with pytest.raises(ValueError):
        decode_gif(enc[:12])
    # flip the interlace bit in the image descriptor → explicit rejection
    mut = bytearray(enc)
    desc = enc.index(b"\x2c")
    mut[desc + 9] |= 0x40
    with pytest.raises(ValueError):
        decode_gif(bytes(mut))


def test_gif_skips_extension_blocks():
    # splice a GIF89a graphic-control extension in front of the image
    # descriptor; the decoder must skip it
    rng = np.random.RandomState(9)
    arr = _pal_image(rng, 6, 9, 8)
    enc = encode_gif(arr)
    desc = enc.index(b"\x2c")
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = enc[:desc] + gce + enc[desc:]
    assert (decode_gif(spliced) == arr).all()


def test_gif_through_image_features_stage_parity(ray_session):
    """A GIF payload and the fake-format payload of the SAME (palettized)
    pixels yield identical features through the actor stage."""
    from invoice_ocr_reconciler_ray.stages.multimodal import (
        _IMG_MAGIC,
        ImageFeatures,
    )

    rng = np.random.RandomState(5)
    img = _pal_image(rng, 12, 7, 16)
    fake = _IMG_MAGIC + struct.pack("<HHB", 12, 7, 3) + img.tobytes()
    fx = ImageFeatures()
    out = fx(
        pa.table(
            {
                "media_id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array(
                    [encode_gif(img), fake, GIF_MAGIC + b"7a garbage"], pa.binary()
                ),
            }
        )
    ).to_pandas()
    gif_row = out[out.media_id == 1].iloc[0]
    fake_row = out[out.media_id == 2].iloc[0]
    assert (gif_row.height, gif_row.width, gif_row.channels) == (12, 7, 3)
    assert list(gif_row.channel_means) == list(fake_row.channel_means)
    assert gif_row.error is None
    assert out[out.media_id == 3].iloc[0].error is not None


def test_media_table_carries_real_gif_rows(ray_session):
    from invoice_ocr_reconciler_ray.stages.multimodal import (
        _decode_any_image,
        media_table_from_documents,
    )

    docs = pa.table({"doc_id": pa.array(list(range(48)), pa.int64())})
    media = media_table_from_documents(docs)
    gifs = [
        p
        for k, p in zip(
            media.column("kind").to_pylist(), media.column("payload").to_pylist()
        )
        if k == "image" and p.startswith(GIF_MAGIC)
    ]
    assert gifs  # d%24==9 rows are real GIFs
    for p in gifs:
        arr = _decode_any_image(p)
        # the GIF rows quantize the keystream to levels {0,85,170,255}
        assert set(np.unique(arr)) <= {0, 85, 170, 255}
