"""Round-8 WAV codec laws (multimodal.wav_decode / wav_encode): the
audio twin of the PNG codec tests — round-trip identity over every
supported width x channel combination, canonical byte identity against
the synth writer, RIFF chunk walking, and the fail-loud error paths.
Pure-Python laws (no Spark session needed); the Spark-side plumbing is
gated by the media_wav_decode battery entry."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from spark_alchemy_spark.multimodal import (
    synth_wav_bytes,
    wav_decode,
    wav_encode,
)


@pytest.mark.parametrize("width", [8, 16])
@pytest.mark.parametrize("channels", [1, 2])
def test_roundtrip_decode_encode_identity(width, channels):
    """decode(encode(x)) == x exactly for widths {8,16} x channels
    {1,2} — the VERDICT r7 task 6 law."""
    rng = np.random.default_rng(width * 10 + channels)
    if width == 8:
        arr = rng.integers(0, 256, size=(257, channels), dtype=np.int64)
    else:
        arr = rng.integers(
            -32768, 32768, size=(257, channels), dtype=np.int64
        )
    buf = wav_encode(arr, 22050, width)
    out, rate, bits = wav_decode(buf)
    assert rate == 22050 and bits == width
    assert out.shape == (257, channels)
    assert (out == arr).all()
    # and the encoder is canonical: encode(decode(b)) == b
    assert wav_encode(out, rate, bits) == buf


def test_encoder_matches_synth_writer_byte_for_byte():
    """For canonical mono PCM16, wav_encode must reproduce
    synth_wav_bytes's independent writer EXACTLY — and the decode of
    either recovers the closed-form samples."""
    for seed in (0, 7, 123):
        canonical = synth_wav_bytes(seed, n_samples=500, sample_rate=16000)
        arr, rate, bits = wav_decode(canonical)
        assert (rate, bits) == (16000, 16)
        idx = np.arange(500, dtype=np.int64)
        want = (seed * 2654435761 + idx * 40503) % 65536 - 32768
        assert (arr[:, 0] == want).all()
        assert wav_encode(arr, rate, bits) == canonical


def test_chunk_walking_skips_extra_chunks():
    """A LIST/INFO chunk between fmt and data (odd-sized payload, so
    the word-alignment pad byte is exercised) and a trailing chunk
    after data must not change the decode."""
    arr = np.arange(-50, 50, dtype=np.int64).reshape(-1, 2)
    plain = wav_encode(arr, 8000, 16)
    padded = wav_encode(
        arr, 8000, 16, extra_chunks=[(b"LIST", b"INFOICMThello")]
    )
    assert len(b"INFOICMThello") % 2 == 1  # pad path really runs
    a, ra, ba = wav_decode(plain)
    b, rb, bb = wav_decode(padded)
    assert (ra, ba) == (rb, bb) and (a == b).all()
    # trailing chunk after data: decoder stops once fmt + data are in
    trailing = plain + b"fact" + struct.pack("<I", 4) + b"\x00" * 4
    c, _, _ = wav_decode(trailing)
    assert (c == a).all()


def test_stereo_interleave_layout():
    """Interleaved frames: hand-built PCM16 stereo bytes must come
    back as (n_frames, 2) with L/R in columns."""
    frames = [(100, -200), (300, -400), (500, -600)]
    payload = b"".join(struct.pack("<hh", l, r) for l, r in frames)
    buf = (
        b"RIFF"
        + struct.pack("<I", 36 + len(payload))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 2, 44100, 44100 * 4, 4, 16)
        + b"data"
        + struct.pack("<I", len(payload))
        + payload
    )
    arr, rate, bits = wav_decode(buf)
    assert (rate, bits) == (44100, 16)
    assert arr.tolist() == [list(f) for f in frames]


def test_eight_bit_is_unsigned_raw():
    """8-bit PCM stores unsigned 0..255; the decoder must return the
    RAW stored values (recentring is a feature concern)."""
    arr = np.array([[0], [128], [255]], dtype=np.int64)
    out, _, bits = wav_decode(wav_encode(arr, 8000, 8))
    assert bits == 8 and out.tolist() == [[0], [128], [255]]


def test_fail_loud_error_paths():
    """Broken containers raise ValueError; unsupported-but-valid WAV
    raises NotImplementedError — same contract as png_decode."""
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"JUNKJUNKJUNKJUNK")
    arr = np.array([[1], [2]], dtype=np.int64)
    # IEEE-float format tag 3
    f = bytearray(wav_encode(arr, 8000, 16))
    struct.pack_into("<H", f, 20, 3)
    with pytest.raises(NotImplementedError, match="format tag"):
        wav_decode(bytes(f))
    # 24-bit width
    w = bytearray(wav_encode(arr, 8000, 16))
    struct.pack_into("<H", w, 34, 24)
    with pytest.raises(NotImplementedError, match="24-bit"):
        wav_decode(bytes(w))
    # truncated fmt chunk (declared size < 16)
    short = (
        b"RIFF" + struct.pack("<I", 14) + b"WAVEfmt "
        + struct.pack("<I", 2) + b"\x01\x00"
    )
    with pytest.raises(ValueError, match="fmt chunk"):
        wav_decode(short)
    # fmt chunk declaring 16 bytes but the buffer ENDS mid-chunk: must
    # be the dirty-media ValueError, never struct.error (review
    # finding — audio_features' except clause would not catch it)
    cut = wav_encode(np.array([[1], [2]], dtype=np.int64), 8000, 16)[:24]
    with pytest.raises(ValueError, match="truncated fmt"):
        wav_decode(cut)
    # data chunk declaring more bytes than remain: fail loud, never
    # silently truncate samples
    full = wav_encode(np.array([[1], [2], [3]], dtype=np.int64), 8000, 16)
    with pytest.raises(ValueError, match="truncated data"):
        wav_decode(full[:-2])
    # missing data chunk
    nodata = wav_encode(arr, 8000, 16)[: 12 + 8 + 16]
    with pytest.raises(ValueError, match="missing"):
        wav_decode(nodata)
    # encoder range validation
    with pytest.raises(ValueError, match="0..255"):
        wav_encode(np.array([[-1]]), 8000, 8)
    with pytest.raises(ValueError, match="-32768"):
        wav_encode(np.array([[40000]]), 8000, 16)
    with pytest.raises(NotImplementedError, match="24-bit"):
        wav_encode(np.array([[1]]), 8000, 24)
