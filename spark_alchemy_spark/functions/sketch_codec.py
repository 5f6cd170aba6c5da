"""Pure-Python writer for Apache Datasketches HLL sketch bytes.

Spark >=3.5 executes HLL aggregation with Apache Datasketches
(``hll_sketch_agg`` / ``hll_union_agg`` / ``hll_union`` /
``hll_sketch_estimate``).  Those built-ins cover every *aggregate* use,
but the reference also ships per-row scalar sketch builders
(``hll_init`` / ``hll_init_collection``, reference
alchemy/.../hll/HLLFunctions.scala:192-218, :294-321) for which Spark has
no built-in.  Running an aggregate per row would shuffle the whole table;
instead we build the serialized sketch bytes directly in an Arrow-batched
pandas UDF.  The bytes are *bit-compatible* with Datasketches' updatable
serialization (coupon LIST / SET modes), so the JVM built-ins can union
and estimate them natively — verified by round-trip tests against
``hll_sketch_agg`` output.

Format knowledge is from the public Apache Datasketches HLL
serialization spec and datasketches-java (PreambleUtil.java); the writer
emits:

* LIST mode  (<= 7 coupons):  8-byte preamble + 2^lgArr coupon ints
* SET  mode  (>  7 coupons): 12-byte preamble + open-hash coupon array

Each distinct input value contributes one "coupon":
``murmur3_128(value_bytes, seed=9001)`` -> ``slot = h0 & (2^26-1)``,
``val = min(nlz(h1), 62) + 1``, ``coupon = (val << 26) | slot``.

Inputs are always the engine's 64-bit cardinality hashes (see
``hashing.py``), serialized little-endian — matching how the JVM path
feeds BIGINT to ``hll_sketch_agg`` (datasketches ``update(long)``).
"""

from __future__ import annotations

import struct

MURMUR_SEED = 9001  # datasketches DEFAULT_UPDATE_SEED
_MASK64 = (1 << 64) - 1
_C1 = 0x87C37B91114253D5
_C2 = 0x4CF5AD432745937F

_KEY_BITS = 26
_KEY_MASK = (1 << _KEY_BITS) - 1

_SER_VER = 1
_FAMILY_HLL = 7
_HLL_8 = 2  # tgtHllType used by Spark's built-ins

_MODE_LIST = 0
_MODE_SET = 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK64


def _fmix(k: int) -> int:
    k ^= k >> 33
    k = (k * 0xFF51AFD7ED558CCD) & _MASK64
    k ^= k >> 33
    k = (k * 0xC4CEB9FE1A85EC53) & _MASK64
    k ^= k >> 33
    return k


def murmur3_128(data: bytes, seed: int = MURMUR_SEED) -> tuple[int, int]:
    """MurmurHash3 x64 128-bit (little-endian), as used by Datasketches."""
    length = len(data)
    h1 = seed & _MASK64
    h2 = seed & _MASK64
    nblocks = length // 16
    for i in range(nblocks):
        k1, k2 = struct.unpack_from("<qq", data, i * 16)
        k1 &= _MASK64
        k2 &= _MASK64
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
        h1 = _rotl(h1, 27)
        h1 = (h1 + h2) & _MASK64
        h1 = (h1 * 5 + 0x52DCE729) & _MASK64
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
        h2 = _rotl(h2, 31)
        h2 = (h2 + h1) & _MASK64
        h2 = (h2 * 5 + 0x38495AB5) & _MASK64
    tail = data[nblocks * 16 :]
    k1 = k2 = 0
    tl = len(tail)
    if tl > 8:
        k2 = int.from_bytes(tail[8:], "little")
        k2 = (k2 * _C2) & _MASK64
        k2 = _rotl(k2, 33)
        k2 = (k2 * _C1) & _MASK64
        h2 ^= k2
    if tl > 0:
        k1 = int.from_bytes(tail[:8], "little")
        k1 = (k1 * _C1) & _MASK64
        k1 = _rotl(k1, 31)
        k1 = (k1 * _C2) & _MASK64
        h1 ^= k1
    h1 ^= length
    h2 ^= length
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    h1 = _fmix(h1)
    h2 = _fmix(h2)
    h1 = (h1 + h2) & _MASK64
    h2 = (h2 + h1) & _MASK64
    return h1, h2


def _nlz64(x: int) -> int:
    if x == 0:
        return 64
    return 64 - x.bit_length()


def coupon_for_long(value: int) -> int:
    """Coupon of one 64-bit input (matches datasketches update(long))."""
    h0, h1 = murmur3_128(struct.pack("<q", value & _MASK64 if value >= 0 else value))
    slot = h0 & _KEY_MASK
    v = min(_nlz64(h1), 62) + 1
    return (v << _KEY_BITS) | slot


def _preamble(pre_ints: int, lg_k: int, lg_arr: int, flags: int, lo_field: int, mode: int) -> bytes:
    """Bytes 0..7 common to LIST/SET images.

    [0]=preInts [1]=serVer [2]=family [3]=lgK [4]=lgArr [5]=flags
    [6]=listCount (LIST) / 0 (SET)   [7]=modeByte = (tgtHllType<<2)|curMode
    """
    mode_byte = (_HLL_8 << 2) | mode
    return bytes([pre_ints, _SER_VER, _FAMILY_HLL, lg_k, lg_arr, flags, lo_field, mode_byte])


def serialize_coupons(coupons, lg_k: int) -> bytes:
    """Serialize a set of coupons as an updatable LIST or SET image.

    LIST (count <= 7) mirrors a freshly updated heap sketch; larger
    counts use the coupon hash-set (SET mode) with the open-addressing
    layout datasketches expects (stride probing on the low bits).
    """
    cset = sorted(set(coupons))
    n = len(cset)
    if n <= 7:
        lg_arr = 3  # 8-slot coupon list, java's initial allocation
        arr = [0] * (1 << lg_arr)
        for i, c in enumerate(cset):
            arr[i] = c
        flags = 0x04 if n == 0 else 0x00  # EMPTY flag bit
        head = _preamble(2, lg_k, lg_arr, flags, n, _MODE_LIST)
        return head + struct.pack(f"<{len(arr)}i", *[c - (1 << 32) if c >= (1 << 31) else c for c in arr])
    # SET mode: open hash of size 2^lgArr at <= 3/4 load.
    lg_arr = 5  # java promotes LIST->SET at a 32-slot hash
    while n > (3 << (lg_arr - 2)):  # 0.75 load factor
        lg_arr += 1
    size = 1 << lg_arr
    arr = [0] * size
    mask = size - 1
    for c in cset:
        probe = c & mask
        stride = ((c & _KEY_MASK) >> lg_arr) | 1
        while arr[probe] != 0:
            probe = (probe + stride) & mask
        arr[probe] = c
    head = _preamble(3, lg_k, lg_arr, 0x00, 0, _MODE_SET)
    count = struct.pack("<i", n)
    body = struct.pack(f"<{size}i", *[c - (1 << 32) if c >= (1 << 31) else c for c in arr])
    return head + count + body


def sketch_bytes_from_hashes(hashes, lg_k: int) -> bytes:
    """Serialized sketch holding every 64-bit hash in ``hashes``.

    Empty input -> a valid empty sketch (cardinality 0), matching the
    reference's "empty collection -> sketch of cardinality 0"
    (HLLFunctions.scala:105-111).
    """
    return serialize_coupons((coupon_for_long(int(h)) for h in hashes), lg_k)


# ---------------------------------------------------------------------------
# Vectorized (numpy) coupon computation for the Arrow/pandas UDF hot path.
# Inputs are always the engine's 64-bit hashes => fixed 8-byte messages, so
# the murmur3 block loop degenerates to a branch-free tail + finalization
# that maps 1:1 onto uint64 array ops.
# ---------------------------------------------------------------------------

import numpy as np

_U64 = np.uint64


def _rotl_vec(x, r):
    return (x << _U64(r)) | (x >> _U64(64 - r))


def _fmix_vec(k):
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xFF51AFD7ED558CCD)
    k = k ^ (k >> _U64(33))
    k = k * _U64(0xC4CEB9FE1A85EC53)
    return k ^ (k >> _U64(33))


def _nlz64_vec(x):
    """Number of leading zeros per element of a uint64 array."""
    n = np.full(x.shape, 64, dtype=np.int64)
    shift = 32
    cur = x.copy()
    while shift:
        big = cur >= (_U64(1) << _U64(shift))
        n = np.where(big, n - shift, n)
        cur = np.where(big, cur >> _U64(shift), cur)
        shift //= 2
    return n - (cur > 0).astype(np.int64)


def coupons_for_longs(values: "np.ndarray") -> "np.ndarray":
    """Vectorized :func:`coupon_for_long` over an int64/uint64 array."""
    with np.errstate(over="ignore"):
        k1 = values.astype(np.int64).view(_U64)
        k1 = k1 * _U64(_C1)
        k1 = _rotl_vec(k1, 31)
        k1 = k1 * _U64(_C2)
        h1 = _U64(MURMUR_SEED) ^ k1
        h2 = np.full(values.shape, MURMUR_SEED, dtype=_U64)
        h1 = h1 ^ _U64(8)
        h2 = h2 ^ _U64(8)
        h1 = h1 + h2
        h2 = h2 + h1
        h1 = _fmix_vec(h1)
        h2 = _fmix_vec(h2)
        h1 = h1 + h2
        h2 = h2 + h1
    slot = (h1 & _U64(_KEY_MASK)).astype(np.int64)
    val = np.minimum(_nlz64_vec(h2), 62) + 1
    return ((val << _KEY_BITS) | slot).astype(np.int64)


# ---------------------------------------------------------------------------
# Dense (HLL-mode) images: what a promoted / merged sketch serializes to.
# Layout confirmed against Spark's own hll_sketch_agg output (updatable
# HLL_8, preInts=10): [0..7] common preamble with curMin at byte 6, then
# hipAccum / kxq0 / kxq1 as little-endian doubles, numAtCurMin, auxCount,
# then 2^lgK one-byte registers.  We emit hip=0 with the OUT_OF_ORDER
# flag (0x10) set — exactly what a DS union produces — so readers use the
# register-derived composite estimator, never a stale HIP value.
# ---------------------------------------------------------------------------

_MODE_HLL = 2
_FLAG_OUT_OF_ORDER = 0x10


def serialize_dense(lg_k: int, registers: "np.ndarray") -> bytes:
    """Updatable HLL_8 image from a dense register array."""
    m = 1 << lg_k
    regs = np.asarray(registers, dtype=np.uint8)
    if len(regs) != m:
        raise ValueError(f"expected {m} registers, got {len(regs)}")
    cur_min = int(regs.min())
    num_at_cur_min = int((regs == cur_min).sum())
    powers = np.power(2.0, -regs.astype(np.float64))
    kxq0 = float(powers[regs < 32].sum())
    kxq1 = float(powers[regs >= 32].sum())
    head = _preamble(10, lg_k, 0, _FLAG_OUT_OF_ORDER, cur_min, _MODE_HLL)
    mid = struct.pack("<dddii", 0.0, kxq0, kxq1, num_at_cur_min, 0)
    return head + mid + regs.tobytes()


def union_images(images, lg_k_out: int | None = None) -> bytes | None:
    """Union any mix of DS images (LIST/SET/HLL_8) into one image.

    Coupon-mode inputs are accumulated as raw coupons and densified
    ONCE (a per-row LIST image must not allocate a 2^lgK register
    array each — that is what makes unions of many tiny sketches
    O(total coupons), not O(n · 2^lgK)).  Mixed precisions downsample
    to the smallest lgK present (register slot = low lgK bits of the
    26-bit coupon key, and the register value is precision-independent,
    so ``max`` over the slot preimage is the exact DS downsampling
    rule).  All-None input -> None (the reference's "no non-null input
    -> NULL sketch" algebra); all-coupon input below the dense
    break-even stays a coupon image.
    """
    from .agkn import coupons_to_registers, ds_parse

    coupon_parts: list[np.ndarray] = []
    dense_parts: list[tuple[int, np.ndarray]] = []
    lg = 32
    seen = False
    for b in images:
        if b is None:
            continue
        seen = True
        kind, k, payload = ds_parse(bytes(b))
        lg = min(lg, k)
        if kind == "coupons":
            coupon_parts.append(payload)
        else:
            dense_parts.append((k, payload))
    if not seen:
        return None
    if lg_k_out is not None:
        lg = min(lg, lg_k_out)
    coupons = (
        np.unique(np.concatenate(coupon_parts))
        if coupon_parts
        else np.empty(0, dtype=np.int64)
    )
    m = 1 << lg
    if not dense_parts and len(coupons) * 4 <= m:
        return serialize_coupons(coupons.tolist(), lg)
    acc = coupons_to_registers(coupons, lg)
    for k, regs in dense_parts:
        if k > lg:
            regs = regs.reshape(1 << (k - lg), m).max(axis=0)
        np.maximum(acc, regs, out=acc)
    return serialize_dense(lg, acc)


def sketch_bytes_from_hashes_vec(hashes, lg_k: int) -> bytes:
    """Vectorized :func:`sketch_bytes_from_hashes` for whole-group
    batches (the SQL UDAF path): coupon image while small, dense HLL_8
    once the register file is the smaller representation."""
    arr = np.asarray(hashes, dtype=np.int64)
    if len(arr) == 0:
        return serialize_coupons((), lg_k)
    coupons = np.unique(coupons_for_longs(arr))
    m = 1 << lg_k
    if len(coupons) * 4 > m:
        regs = np.zeros(m, dtype=np.uint8)
        slots = (coupons & _KEY_MASK) & (m - 1)
        vals = (coupons >> _KEY_BITS).astype(np.uint8)
        np.maximum.at(regs, slots, vals)
        return serialize_dense(lg_k, regs)
    return serialize_coupons(coupons.tolist(), lg_k)
