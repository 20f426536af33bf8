"""Real BMP codec: roundtrip incl. row padding, 32-bit + top-down decode,
corruption isolation, and container-parity through the ImageFeatures stage
(same pixels as fake/PNG -> identical features)."""

import struct

import numpy as np
import pyarrow as pa

from invoice_ocr_reconciler_ray.functions.bmp import (
    BMP_MAGIC,
    decode_bmp,
    encode_bmp,
)


def test_bmp_roundtrip_various_shapes():
    rng = np.random.RandomState(11)
    # widths chosen to hit every row-padding residue (w*3 mod 4)
    for h, w in [(1, 1), (3, 2), (5, 3), (4, 4), (7, 5), (24, 32)]:
        img = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
        back = decode_bmp(encode_bmp(img))
        assert (back == img).all(), (h, w)


def test_bmp_decodes_32bit_and_topdown():
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    # hand-build a 32-bit top-down BMP of the same pixels
    h, w = img.shape[:2]
    off = 54
    pix = bytearray()
    for y in range(h):  # top-down: natural order
        for x in range(w):
            r, g, b = img[y, x]
            pix += bytes([b, g, r, 255])
    header = struct.pack("<2sIHHI", BMP_MAGIC, off + len(pix), 0, 0, off)
    info = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(pix), 0, 0, 0, 0)
    assert (decode_bmp(header + info + bytes(pix)) == img).all()


def test_bmp_rejects_corruption_and_unsupported():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_bmp(img)
    for bad in (b"XX" + good[2:], good[:20], b"BM"):
        try:
            decode_bmp(bad)
            raise AssertionError("should have raised")
        except ValueError:
            pass
    # RLE compression flag -> unsupported
    rle = bytearray(good)
    struct.pack_into("<I", rle, 30, 1)
    try:
        decode_bmp(bytes(rle))
        raise AssertionError("should have raised")
    except ValueError:
        pass


def test_bmp_through_image_features_stage_parity(ray_session):
    """A BMP payload and the fake-format payload of the SAME pixels yield
    identical features through the actor stage (both containers lossless)."""
    from invoice_ocr_reconciler_ray.stages.multimodal import (
        _IMG_MAGIC,
        ImageFeatures,
    )

    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (12, 7, 3), dtype=np.uint8)
    fake = (
        _IMG_MAGIC + struct.pack("<HHB", 12, 7, 3) + img.tobytes()
    )
    fx = ImageFeatures()
    out = fx(
        pa.table(
            {
                "media_id": pa.array([1, 2, 3], pa.int64()),
                "payload": pa.array(
                    [encode_bmp(img), fake, b"BMgarbage"], pa.binary()
                ),
            }
        )
    ).to_pandas()
    bmp_row = out[out.media_id == 1].iloc[0]
    fake_row = out[out.media_id == 2].iloc[0]
    assert (bmp_row.height, bmp_row.width, bmp_row.channels) == (12, 7, 3)
    assert list(bmp_row.channel_means) == list(fake_row.channel_means)
    assert bmp_row.error is None
    assert out[out.media_id == 3].iloc[0].error is not None


def test_media_table_emits_all_four_image_containers(ray_session):
    """media_table_from_documents mixes fake, PNG, BMP and GIF image rows;
    every one decodes through _decode_any_image."""
    from invoice_ocr_reconciler_ray.functions.gif import GIF_MAGIC
    from invoice_ocr_reconciler_ray.functions.png import PNG_MAGIC
    from invoice_ocr_reconciler_ray.stages.multimodal import (
        _IMG_MAGIC,
        _decode_any_image,
        media_table_from_documents,
    )

    docs = pa.table({"doc_id": pa.array(list(range(48)), pa.int64())})
    media = media_table_from_documents(docs)
    kinds = set()
    for kind, payload in zip(
        media.column("kind").to_pylist(), media.column("payload").to_pylist()
    ):
        if kind != "image":
            continue
        if payload.startswith(_IMG_MAGIC):
            kinds.add("fake")
        elif payload.startswith(PNG_MAGIC):
            kinds.add("png")
        elif payload.startswith(BMP_MAGIC):
            kinds.add("bmp")
        elif payload.startswith(GIF_MAGIC):
            kinds.add("gif")
        arr = _decode_any_image(payload)
        assert arr.ndim == 3 and arr.shape[2] == 3
    assert kinds == {"fake", "png", "bmp", "gif"}
