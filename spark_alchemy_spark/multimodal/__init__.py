"""Multimodal (image/audio/video) column support.

Media ride through the engine as opaque ``binary`` columns plus a typed
metadata struct — the schema pattern that keeps 100 TB of media
scannable with column pruning (metadata-only queries never read bytes)
and partitionable by content type.

Three layers:

* **Header sniffing / metadata** (`sniff_mime`, `png_dimensions`,
  `wav_sample_rate`, `with_media_metadata`) — pure JVM byte expressions
  (substring/hex/conv on BinaryType), no decode libraries, fully
  oracle-checkable.
* **Decode / transform** (`decode_image`, `resize_nearest`,
  `sample_frames`, `image_features`) — Arrow ``mapInPandas`` stages
  with real batch plumbing.  Actual JPEG/PNG/audio decoding requires
  codec libraries not present in this environment; those paths raise
  ``NotImplementedError`` behind an import-try, while the deterministic
  ``SYNTH`` raw format exercises the full pipeline (schema, batch
  shapes, per-partition decode) end to end.
* **Synthesis** (`synth_image_bytes`) — deterministic fake media for
  tests/benchmarks.

SYNTH format: ``b"SYNT" | u8 channels | u16be width | u16be height |
raw channel-interleaved uint8 pixels``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "struct<mime:string,width:int,height:int,channels:int,n_bytes:bigint>"
)


def _col(c) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def _be_int(data: Column, pos: int, nbytes: int) -> Column:
    """Big-endian unsigned int from bytes [pos, pos+nbytes) of a binary
    column (1-indexed), via hex -> conv — stays in codegen."""
    return F.conv(F.hex(F.substring(data, pos, nbytes)), 16, 10).cast("long")


def sniff_mime(data) -> Column:
    """Magic-byte content sniffing on the first bytes of a binary column."""
    d = _col(data)
    head8 = F.hex(F.substring(d, 1, 8))
    head4 = F.hex(F.substring(d, 1, 4))
    return (
        F.when(head8 == "89504E470D0A1A0A", F.lit("image/png"))
        .when(F.substring(head4, 1, 6) == "FFD8FF", F.lit("image/jpeg"))
        .when(head4 == "52494646", F.lit("audio/wav"))  # RIFF
        .when(head4 == "53594E54", F.lit("image/synth"))  # SYNT
        .otherwise(F.lit("application/octet-stream"))
    )


def png_dimensions(data) -> tuple[Column, Column]:
    """(width, height) from a PNG IHDR chunk (bytes 17-24, big-endian)."""
    d = _col(data)
    return _be_int(d, 17, 4).cast("int"), _be_int(d, 21, 4).cast("int")


def synth_dimensions(data) -> tuple[Column, Column, Column]:
    """(channels, width, height) from the SYNTH header."""
    d = _col(data)
    return (
        _be_int(d, 5, 1).cast("int"),
        _be_int(d, 6, 2).cast("int"),
        _be_int(d, 8, 2).cast("int"),
    )


def wav_sample_rate(data) -> Column:
    """Sample rate from a canonical WAV fmt chunk (little-endian u32 at
    byte 25) — little-endian assembled from per-byte reads."""
    d = _col(data)
    return (
        _be_int(d, 25, 1)
        + _be_int(d, 26, 1) * 256
        + _be_int(d, 27, 1) * 65536
        + _be_int(d, 28, 1) * 16777216
    )


def with_media_metadata(df: DataFrame, data_col: str, out_col: str = "media_meta") -> DataFrame:
    """Attach the typed metadata struct, JVM-side only."""
    d = F.col(data_col)
    mime = sniff_mime(d)
    png_w, png_h = png_dimensions(d)
    sy_c, sy_w, sy_h = synth_dimensions(d)
    meta = F.struct(
        mime.alias("mime"),
        F.when(mime == "image/png", png_w)
        .when(mime == "image/synth", sy_w)
        .alias("width"),
        F.when(mime == "image/png", png_h)
        .when(mime == "image/synth", sy_h)
        .alias("height"),
        F.when(mime == "image/synth", sy_c).alias("channels"),
        F.octet_length(d).cast("bigint").alias("n_bytes"),
    )
    return df.withColumn(out_col, meta)


# ---------------------------------------------------------------------------
# Synthesis (deterministic fake media)
# ---------------------------------------------------------------------------


def synth_image_bytes(seed: int, width: int, height: int, channels: int = 3) -> bytes:
    """Deterministic SYNTH image: pixel = (seed + x + y*width + c) % 256."""
    idx = np.arange(width * height * channels, dtype=np.int64)
    pix = ((seed + idx) % 256).astype(np.uint8)
    head = b"SYNT" + bytes([channels]) + width.to_bytes(2, "big") + height.to_bytes(2, "big")
    return head + pix.tobytes()


def synth_image_udf():
    @F.pandas_udf("binary")
    def make(seed: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        return pd.Series(
            [
                synth_image_bytes(int(s), int(wi), int(hi))
                for s, wi, hi in zip(seed, w, h)
            ],
            dtype=object,
        )

    return make


def png_image_udf():
    """The REAL-container twin of :func:`synth_image_udf`: the same
    deterministic pixels, PNG-encoded (pure-stdlib :func:`png_encode`,
    scanline filter cycling with the seed so all five filter paths
    appear in any non-trivial corpus)."""

    @F.pandas_udf("binary")
    def make(seed: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        return pd.Series(
            [
                png_encode(
                    _decode_synth(synth_image_bytes(int(s), int(wi), int(hi))),
                    filter_type=int(s) % 5,
                )
                for s, wi, hi in zip(seed, w, h)
            ],
            dtype=object,
        )

    return make


# ---------------------------------------------------------------------------
# Decode / transform (Arrow batch stages)
# ---------------------------------------------------------------------------


def _decode_synth(buf: bytes) -> np.ndarray:
    if buf[:4] != b"SYNT":
        raise ValueError("not a SYNTH buffer")
    c = buf[4]
    w = int.from_bytes(buf[5:7], "big")
    h = int.from_bytes(buf[7:9], "big")
    return np.frombuffer(buf, dtype=np.uint8, offset=9).reshape(h, w, c)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
#: PNG color type -> channel count (bit depth 8, the overwhelmingly
#: common web case this pure-stdlib decoder supports)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def png_decode(buf: bytes) -> np.ndarray:
    """Pure-Python PNG decoder (stdlib zlib only — no PIL/pillow):
    8-bit-depth, non-interlaced grayscale / RGB / gray+alpha / RGBA,
    all five scanline filters (None/Sub/Up/Average/Paeth) per the
    public PNG specification.  Returns HxWxC uint8.

    This exists so the multimodal tier runs on REAL image bytes in
    codec-less environments (VERDICT r6 task 8); a production cluster
    swaps in a native codec for throughput, behind the same
    ``_decode_any`` seam.  Up is vectorized; Sub/Average/Paeth carry a
    per-byte recurrence along the scanline (inherently sequential —
    each byte's predictor reads the just-reconstructed left
    neighbor)."""
    import zlib

    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG buffer")
    pos, idat = 8, b""
    w = h = depth = color = interlace = None
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln  # length + type + data + crc
        if typ == b"IHDR":
            w = int.from_bytes(data[0:4], "big")
            h = int.from_bytes(data[4:8], "big")
            depth, color, interlace = data[8], data[9], data[12]
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    if depth != 8 or interlace != 0 or color not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"png_decode supports 8-bit non-interlaced color types "
            f"{sorted(_PNG_CHANNELS)}; got depth={depth} color={color} "
            f"interlace={interlace}"
        )
    c = _PNG_CHANNELS[color]
    stride = w * c
    raw = zlib.decompress(idat)
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    rpos = 0
    for y in range(h):
        ft = raw[rpos]
        cur = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=rpos + 1
        ).copy()
        rpos += 1 + stride
        if ft == 0:
            pass
        elif ft == 2:  # Up (uint8 add wraps mod 256 natively)
            cur += prev
        elif ft == 1:  # Sub
            for i in range(c, stride):
                cur[i] = (int(cur[i]) + int(cur[i - c])) & 0xFF
        elif ft == 3:  # Average
            for i in range(stride):
                a = int(cur[i - c]) if i >= c else 0
                cur[i] = (int(cur[i]) + ((a + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth
            for i in range(stride):
                a = int(cur[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                cur[i] = (int(cur[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ft}")
        out[y] = cur
        prev = out[y]
    return out.reshape(h, w, c)


def png_encode(img: np.ndarray, filter_type: int = 0) -> bytes:
    """Minimal PNG encoder (stdlib zlib only) for HxWxC uint8 arrays
    (C in {1, 2, 3, 4}); ``filter_type`` applies one of the five
    scanline filters to every row — which makes decode∘encode a
    round-trip law over ALL filter paths (tests/test_multimodal png
    laws), not just the store-uncompressed one."""
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color, 0, 0, 0])
    )
    flat = img.reshape(h, w * c).astype(np.uint8)
    stride = w * c
    lines = []
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        cur = flat[y]
        if filter_type == 0:
            enc = cur
        elif filter_type == 2:
            enc = cur - prev
        elif filter_type == 1:
            left = np.concatenate([np.zeros(c, np.uint8), cur[:-c]])
            enc = cur - left
        elif filter_type == 3:
            left = np.concatenate([np.zeros(c, np.uint8), cur[:-c]])
            enc = cur - (
                (left.astype(np.int32) + prev.astype(np.int32)) >> 1
            ).astype(np.uint8)
        elif filter_type == 4:
            enc = np.empty(stride, dtype=np.uint8)
            for i in range(stride):
                a = int(cur[i - c]) if i >= c else 0
                b = int(prev[i])
                cc = int(prev[i - c]) if i >= c else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                enc[i] = (int(cur[i]) - pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {filter_type}")
        lines.append(bytes([filter_type]) + enc.tobytes())
        prev = cur
    idat = zlib.compress(b"".join(lines))

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            len(data).to_bytes(4, "big")
            + typ
            + data
            + zlib.crc32(typ + data).to_bytes(4, "big")
        )

    return (
        _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _decode_any(buf: bytes) -> np.ndarray:
    """Decode to an HxWxC uint8 array.  SYNTH and PNG decode natively
    (PNG via the pure-stdlib :func:`png_decode` — real image bytes
    work without any codec library); other formats fall through to an
    import-try on PIL, absent in this environment."""
    if buf[:4] == b"SYNT":
        return _decode_synth(buf)
    if buf[:8] == _PNG_SIG:
        return png_decode(buf)
    try:
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(buf)))
    except ImportError as e:
        raise NotImplementedError(
            "non-SYNTH/PNG image decoding needs PIL/pillow, "
            "not available here"
        ) from e


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    h, w = img.shape[:2]
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    return img[ys][:, xs]


def image_features(df: DataFrame, data_col: str, id_col: str, thumb: int = 8) -> DataFrame:
    """Decode → nearest-resize to ``thumb``² → per-channel mean/std +
    flattened thumbnail embedding, one Arrow batch at a time.

    Returns (id, width, height, channels, mean array<double>,
    embedding array<double>).  This is the shape a real CLIP-style
    featurizer plugs into: swap the numpy body, keep the plumbing.
    """

    def gen(batches):
        for pdf in batches:
            ids, ws, hs, cs, means, embs = [], [], [], [], [], []
            for i, buf in zip(pdf[id_col], pdf[data_col]):
                img = _decode_any(bytes(buf))
                h, w, c = img.shape
                t = resize_nearest(img, thumb, thumb).astype(np.float64) / 255.0
                ids.append(i)
                ws.append(w)
                hs.append(h)
                cs.append(c)
                means.append(img.reshape(-1, c).mean(axis=0).round(4).tolist())
                embs.append(t.mean(axis=2).reshape(-1).round(4).tolist())
            yield pd.DataFrame(
                {
                    id_col: ids,
                    "width": ws,
                    "height": hs,
                    "channels": cs,
                    "channel_mean": means,
                    "embedding": embs,
                }
            )

    schema = (
        f"{id_col} long, width int, height int, channels int, "
        "channel_mean array<double>, embedding array<double>"
    )
    return df.select(id_col, data_col).mapInPandas(gen, schema)


def sample_frames(
    df: DataFrame, data_col: str, id_col: str, every_n: int = 2
) -> DataFrame:
    """Frame sampling for frame-major media: treat each image row of a
    SYNTH buffer as a 'frame' and keep every ``every_n``-th, emitting
    one output row per sampled frame (id, frame_idx, frame_bytes).
    Demonstrates the 1->N mapInPandas expansion used by video pipelines."""

    def gen(batches):
        for pdf in batches:
            out_id, out_idx, out_bytes = [], [], []
            for i, buf in zip(pdf[id_col], pdf[data_col]):
                img = _decode_any(bytes(buf))
                for fi in range(0, img.shape[0], every_n):
                    row = img[fi]
                    out_id.append(i)
                    out_idx.append(fi)
                    out_bytes.append(row.tobytes())
            yield pd.DataFrame(
                {id_col: out_id, "frame_idx": out_idx, "frame_bytes": out_bytes}
            )

    return df.select(id_col, data_col).mapInPandas(
        gen, f"{id_col} long, frame_idx int, frame_bytes binary"
    )


# ---------------------------------------------------------------------------
# Audio: WAV/PCM16 — codec-free, so decode is REAL here (not stubbed)
# ---------------------------------------------------------------------------


def synth_wav_bytes(seed: int, n_samples: int = 1000, sample_rate: int = 16000) -> bytes:
    """Canonical 44-byte-header mono PCM16 WAV with deterministic
    samples ``((seed*2654435761 + i*40503) % 65536) - 32768`` — the
    closed form a SQL oracle reproduces with generate_series."""
    import struct

    idx = np.arange(n_samples, dtype=np.int64)
    samples = ((seed * 2654435761 + idx * 40503) % 65536 - 32768).astype("<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return hdr + data


def synth_wav_udf():
    """(seed) -> WAV bytes, Arrow-batched."""

    @F.pandas_udf("binary")
    def make(seed: pd.Series) -> pd.Series:
        return seed.map(lambda s: synth_wav_bytes(int(s)))

    return make


def wav_decode(buf: bytes) -> tuple[np.ndarray, int, int]:
    """Pure-stdlib RIFF/PCM WAV decoder (public WAVE spec; ``struct``
    + numpy buffer views only — no audio library): walks the RIFF
    chunk list rather than assuming the canonical 44-byte layout, so
    real-world files with LIST/INFO/fact chunks or an extended fmt
    chunk decode too.  Word-aligned chunk stepping (odd-sized chunks
    carry a pad byte, per spec).  Supports PCM (format tag 1) at
    sample widths 8 (unsigned, stored 0..255) and 16 (signed
    little-endian), any channel count (interleaved frames).

    Returns ``(samples, sample_rate, sample_width)`` with ``samples``
    an int32 array of shape (n_frames, n_channels) holding the RAW
    stored values (8-bit stays 0..255 — recentring is a feature
    concern, not a codec concern).  Raises ValueError on a broken
    container and NotImplementedError on non-PCM / unsupported widths
    (float WAV, 24-bit) — the same fail-loud contract as
    :func:`png_decode`."""
    import struct

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (csize,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + csize]
        if cid in (b"fmt ", b"data") and len(body) < csize:
            # a load-bearing chunk whose declared size runs past the
            # buffer is a truncated file: fail loud (ValueError, the
            # dirty-media contract) instead of struct.error from a
            # short unpack or silently dropping tail samples
            raise ValueError(
                f"truncated {cid.decode(errors='replace').strip()} chunk"
            )
        if cid == b"fmt ":
            if csize < 16:
                raise ValueError("fmt chunk too short")
            tag, n_ch, rate, _brate, _balign, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            fmt = (tag, n_ch, rate, bits)
        elif cid == b"data":
            data = body
        pos += 8 + csize + (csize & 1)  # word alignment pad
        if fmt is not None and data is not None:
            break
    if fmt is None or data is None:
        raise ValueError("missing fmt / data chunk")
    tag, n_ch, rate, bits = fmt
    if tag != 1:
        raise NotImplementedError(
            f"only PCM (format tag 1) is supported, got tag {tag}"
        )
    if bits not in (8, 16):
        raise NotImplementedError(
            f"only 8/16-bit PCM is supported, got {bits}-bit"
        )
    if n_ch < 1:
        raise ValueError("channel count must be >= 1")
    dtype = np.dtype("u1") if bits == 8 else np.dtype("<i2")
    frame_bytes = (bits // 8) * n_ch
    n_frames = len(data) // frame_bytes
    samples = (
        np.frombuffer(data, dtype=dtype, count=n_frames * n_ch)
        .astype(np.int32)
        .reshape(n_frames, n_ch)
    )
    return samples, int(rate), int(bits)


def wav_encode(
    samples: np.ndarray,
    sample_rate: int,
    sample_width: int = 16,
    extra_chunks: list[tuple[bytes, bytes]] | None = None,
) -> bytes:
    """Canonical RIFF/PCM writer — the inverse of :func:`wav_decode`:
    ``wav_decode(wav_encode(x))`` returns x exactly for every
    supported width x channel combination (pytest law), and for
    canonical mono-PCM16 input the bytes are identical to
    :func:`synth_wav_bytes`'s writer (cross-implementation law).
    ``samples`` is (n_frames, n_channels) or 1-D (mono) of raw stored
    values; ``extra_chunks`` inserts additional RIFF chunks (e.g. a
    LIST/INFO block, as real recorders emit) between fmt and data —
    spec-faithful word alignment included."""
    import struct

    arr = np.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    n_frames, n_ch = arr.shape
    if sample_width == 8:
        if n_frames and (arr.min() < 0 or arr.max() > 255):
            raise ValueError("8-bit PCM stores unsigned 0..255")
        payload = arr.astype("u1").tobytes()
    elif sample_width == 16:
        if n_frames and (arr.min() < -32768 or arr.max() > 32767):
            raise ValueError("16-bit PCM stores signed -32768..32767")
        payload = arr.astype("<i2").tobytes()
    else:
        raise NotImplementedError(
            f"only 8/16-bit PCM is supported, got {sample_width}-bit"
        )
    block_align = n_ch * (sample_width // 8)
    chunks = [
        (
            b"fmt ",
            struct.pack(
                "<HHIIHH",
                1,
                n_ch,
                sample_rate,
                sample_rate * block_align,
                block_align,
                sample_width,
            ),
        )
    ]
    chunks.extend(extra_chunks or [])
    chunks.append((b"data", payload))
    body = b"".join(
        cid
        + struct.pack("<I", len(c))
        + c
        + (b"\x00" if len(c) & 1 else b"")
        for cid, c in chunks
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def _decode_audio_any(buf: bytes) -> tuple[np.ndarray, int, int]:
    """Audio twin of :func:`_decode_any`: WAV decodes natively via the
    pure-stdlib :func:`wav_decode`; other containers fall through to
    an import-try on soundfile, absent in this environment."""
    if buf[:4] == b"RIFF" and buf[8:12] == b"WAVE":
        return wav_decode(buf)
    try:
        import io

        import soundfile  # noqa: F401

        data, rate = soundfile.read(io.BytesIO(buf), dtype="int16")
        arr = data.astype(np.int32)
        # soundfile returns (frames,) mono or (frames, channels): add
        # the channel axis for mono, never transpose (a .T here would
        # flip stereo into (channels, frames) — review finding)
        if arr.ndim == 1:
            arr = arr[:, None]
        return arr, int(rate), 16
    except ImportError as e:
        raise NotImplementedError(
            "non-WAV audio decoding needs soundfile, not available here"
        ) from e


def audio_features(df: DataFrame, data_col: str, id_col: str) -> DataFrame:
    """Decode audio clips and emit per-clip features.  The decode is
    the chunk-walking :func:`wav_decode` behind the
    :func:`_decode_audio_any` seam (real WAV bytes, any chunk layout,
    8/16-bit x any channel count) — container parsing is the codec's
    concern, the featurizer contract is SAMPLES, mirroring the
    image path's pixels contract.  Stats are vectorized per Arrow
    batch over the interleaved sample values (channels flattened).
    Undecodable rows (wrong container, unsupported codec) come back
    as NULL features, not errors — a curation scan must survive dirty
    media columns.

    Output: (id, sample_rate, n_samples, rms [2dp], peak)."""

    def run(batches):
        for pdf in batches:
            out = []
            for _, row in pdf.iterrows():
                buf = bytes(row[data_col])
                try:
                    arr, sr, _bits = _decode_audio_any(buf)
                except (ValueError, NotImplementedError):
                    out.append((row[id_col], None, None, None, None))
                    continue
                flat = arr.astype(np.float64).ravel()
                if not flat.size:
                    out.append((row[id_col], sr, 0, None, None))
                    continue
                rms = float(np.round(np.sqrt(np.mean(flat**2)), 2))
                out.append(
                    (
                        row[id_col],
                        sr,
                        flat.size,
                        rms,
                        int(np.abs(flat).max()),
                    )
                )
            yield pd.DataFrame(
                out,
                columns=[id_col, "sample_rate", "n_samples", "rms", "peak"],
            )

    schema = (
        f"{id_col} long, sample_rate int, n_samples bigint, "
        "rms double, peak int"
    )
    return df.select(id_col, data_col).mapInPandas(run, schema)


def ahash_bits(df: DataFrame, data_col: str, id_col: str) -> DataFrame:
    """Average-hash (aHash) perceptual fingerprints: per pixel, the
    grayscale value is compared against the image mean and the 0/1
    outcomes concatenate into a bit string — the classic cheap
    image near-dup key (identical or near-identical images collide).

    The threshold test is kept in INTEGER form (``n_pixels *
    channel_sum(pixel) > sum(all pixels)``, equivalent to gray > mean)
    so the fingerprint is exactly reproducible by any engine — no
    float mean to drift by a ULP.  One Arrow ``mapInPandas`` pass;
    returns (id, ahash string)."""

    def gen(batches):
        for pdf in batches:
            ids, hashes = [], []
            for i, buf in zip(pdf[id_col], pdf[data_col]):
                img = _decode_any(bytes(buf)).astype(np.int64)
                h, w, c = img.shape
                s3 = img.reshape(-1, c).sum(axis=1)
                total = int(s3.sum())
                n = h * w
                bits = (n * s3 > total).astype(np.uint8)
                ids.append(i)
                hashes.append("".join("1" if b else "0" for b in bits))
            yield pd.DataFrame({id_col: ids, "ahash": hashes})

    return df.select(id_col, data_col).mapInPandas(
        gen, f"{id_col} long, ahash string"
    )


def frame_mean_intensity(df: DataFrame, data_col: str, id_col: str) -> DataFrame:
    """Per-frame mean pixel intensity for frame-major media (each image
    row of a SYNTH buffer = one 'frame'): the 1-D signal scene-cut /
    shot-boundary detection thresholds.  Arrow mapInPandas decode, one
    output row per frame; the mean is sum/size in float64 (exact for
    uint8 sums, bit-identical to the oracle's closed-form division).
    Returns (id, frame_idx, mean_intensity)."""

    def gen(batches):
        for pdf in batches:
            out_id, out_idx, out_mean = [], [], []
            for i, buf in zip(pdf[id_col], pdf[data_col]):
                img = _decode_any(bytes(buf))
                for fi in range(img.shape[0]):
                    row = img[fi]
                    out_id.append(i)
                    out_idx.append(fi)
                    out_mean.append(float(row.sum(dtype=np.float64) / row.size))
            yield pd.DataFrame(
                {id_col: out_id, "frame_idx": out_idx, "mean_intensity": out_mean}
            )

    return df.select(id_col, data_col).mapInPandas(
        gen, f"{id_col} long, frame_idx int, mean_intensity double"
    )
