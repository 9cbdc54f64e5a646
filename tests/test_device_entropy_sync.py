"""Speculative-resync on-chip decode of restart-free baseline JPEGs.

The serial entropy chain (reference: one bit-serial scan,
/root/reference/src/jpeg/decoder.zig:1294-1454) is decoded on parallel
chunk lanes via Huffman self-synchronization with exact verification;
these tests require bit-exact parity with the host front-end across the
reference corpus's full subsampling matrix.
"""

import os

import numpy as np
import pytest

from zpix_tpu.errors import UnsupportedError
from zpix_tpu.parallel.batch import BatchJpegDecoder
from zpix_tpu.parallel.device_entropy_sync import (
    SyncJpegDecoder,
    prep_batch_sync,
)

slow = pytest.mark.slow

# The default run keeps one representative per decode shape (no-restart
# color, 4:2:0, gray-with-declared-2x2); the full subsampling matrix runs
# with ZPIX_SLOW=1 (each case costs ~20 s of XLA:CPU compile on the dev
# host).
CORPUS = [
    "video-001.jpeg",
    pytest.param("video-001.q50.410.jpeg", marks=slow),
    pytest.param("video-001.q50.411.jpeg", marks=slow),
    "video-001.q50.420.jpeg",
    pytest.param("video-001.q50.422.jpeg", marks=slow),
    pytest.param("video-001.q50.440.jpeg", marks=slow),
    pytest.param("video-001.q50.444.jpeg", marks=slow),
    pytest.param("video-005.gray.q50.jpeg", marks=slow),
    "video-005.gray.q50.2x2.jpeg",  # gray must ignore declared 2x2 sampling
]


@pytest.mark.parametrize("name", CORPUS)
def test_corpus_parity(testdata, name):
    with open(os.path.join(testdata, name), "rb") as f:
        data = f.read()
    dec = SyncJpegDecoder()
    img, ok = dec.decode([data, data])
    assert bool(ok), f"{name}: sync decode failed verification"
    ref = np.asarray(BatchJpegDecoder().decode([data]))
    img = np.asarray(img)
    assert np.array_equal(img[0], ref[0]) and np.array_equal(img[1], ref[0])


def test_mixed_content_batch(testdata):
    """Images of equal geometry but different content (hence different
    compressed lengths) decode together; short scans pad with idle
    chunk lanes."""
    import io

    from PIL import Image

    def synth(seed):
        rng = np.random.RandomState(seed)
        x = np.linspace(0, 9, 160)
        base = (128 + 100 * np.sin(x[None, :] * np.cos(x[:, None]) + seed)).astype(
            np.uint8
        )
        noise = rng.randint(0, 20, (160, 160)).astype(np.uint8)
        rgb = np.stack([base ^ noise, base.T, base // 2], -1)
        buf = io.BytesIO()
        Image.fromarray(rgb).save(buf, format="JPEG", quality=55, subsampling=2)
        return buf.getvalue()

    datas = [synth(i) for i in range(4)]
    img, ok = SyncJpegDecoder().decode(datas)
    assert bool(ok)
    refs = np.concatenate(
        [np.asarray(BatchJpegDecoder().decode([d])) for d in datas]
    )
    assert np.array_equal(np.asarray(img), refs)


def test_rejects_restart_streams(testdata):
    with open(os.path.join(testdata, "video-001.restart2.jpeg"), "rb") as f:
        data = f.read()
    with pytest.raises(UnsupportedError):
        prep_batch_sync([data])


def test_corruption_detected(testdata):
    """Corrupted entropy bytes must trip exact verification (ok=False) or
    produce output differing from the clean decode - never silent."""
    with open(os.path.join(testdata, "video-001.jpeg"), "rb") as f:
        clean = f.read()
    dec = SyncJpegDecoder()
    ref, ok_ref = dec.decode([clean])
    assert bool(ok_ref)
    data = bytearray(clean)
    tail = len(data) - 400
    for i in range(tail, tail + 30):
        data[i] ^= 0x41
    try:
        out, ok = dec.decode([bytes(data)])
    except Exception:
        return  # rejected at destuff: acceptable
    if bool(ok):
        assert not np.array_equal(np.asarray(out), np.asarray(ref))


def test_flat_low_entropy_image():
    """Tiny blocks (DC+EOB only, ~4-6 bits) must not overflow the
    per-chunk block-end capacity (found by review: mb=chunk_bytes failed
    every flat image)."""
    import io

    from PIL import Image

    flat = np.full((64, 64, 3), 128, np.uint8)
    buf = io.BytesIO()
    Image.fromarray(flat).save(buf, format="JPEG", quality=50, subsampling=2)
    img, ok = SyncJpegDecoder().decode([buf.getvalue()])
    assert bool(ok)
    ref = np.asarray(BatchJpegDecoder().decode([buf.getvalue()]))
    assert np.array_equal(np.asarray(img)[0], ref[0])


def test_cmyk_and_rgb_parity(testdata):
    """4-component and RGB-colorspace restart-free JPEGs decode through
    the sync path with host parity (applyBlack/convertToRGB arms,
    decoder.zig:699-902)."""
    import io

    import zpix_tpu.codecs.jpeg as jpeg_codec
    from PIL import Image

    rgb = (np.arange(64 * 48 * 3) % 253).astype(np.uint8).reshape(48, 64, 3)
    buf = io.BytesIO()
    Image.fromarray(rgb).convert("CMYK").save(buf, format="JPEG", quality=75)
    data = buf.getvalue()
    out, ok = SyncJpegDecoder().decode([data])
    host = jpeg_codec.decode(data)
    assert bool(ok) and np.array_equal(np.asarray(out)[0], host.pix)

    with open(os.path.join(testdata, "video-001.rgb.jpeg"), "rb") as f:
        data = f.read()
    out, ok = SyncJpegDecoder().decode([data])
    host = jpeg_codec.decode(data)
    assert bool(ok) and np.array_equal(np.asarray(out)[0], host.pix[..., :3])
