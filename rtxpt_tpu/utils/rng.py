"""Stateless sample generators.

TPU-native re-design of the reference's per-(pixel, vertexIndex, sampleIndex,
effect-seed) stateless generators (reference: Rtxpt/Shaders/PathTracer/Utils/
SampleGenerators.hlsli:29-41, StatelessSampleGenerators.hlsli,
NoiseAndSequences.hlsli:122-235 — hash-based Owen-scrambled Sobol' after
Burley, "Practical Hash-Based Owen Scrambling", JCGT 2020).

Everything is a pure function of uint32 indices — no RNG state is carried in
the path payload, which is exactly what a traced/jitted wavefront integrator
wants: any sample dimension can be regenerated anywhere from
(pixel_seed, sample_index, dimension).

API sketch:
    seed = pixel_seed(px, py, vertex_index, effect)       # uint32 [...]
    u    = ld_sample(sample_index, seed, dim)              # f32 in [0,1)
    u2   = ld_sample2(sample_index, seed, dim)             # (f32, f32)
    u    = uniform_sample(seed, dim)                       # hash-chain fallback
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32

# ---------------------------------------------------------------------------
# Bit utilities
# ---------------------------------------------------------------------------


def _u32(x):
    return jnp.asarray(x).astype(U32)


def reverse_bits_u32(x):
    """Bit-reverse each uint32 lane."""
    x = _u32(x)
    x = (x >> 16) | (x << 16)
    x = ((x & U32(0x00FF00FF)) << 8) | ((x >> 8) & U32(0x00FF00FF))
    x = ((x & U32(0x0F0F0F0F)) << 4) | ((x >> 4) & U32(0x0F0F0F0F))
    x = ((x & U32(0x33333333)) << 2) | ((x >> 2) & U32(0x33333333))
    x = ((x & U32(0x55555555)) << 1) | ((x >> 1) & U32(0x55555555))
    return x


def lowbias32(x):
    """Low-bias integer hash (public domain constants, Chris Wellons)."""
    x = _u32(x)
    x ^= x >> 16
    x *= U32(0x7FEB352D)
    x ^= x >> 15
    x *= U32(0x846CA68B)
    x ^= x >> 16
    return x


def hash_combine(a, b):
    """Order-dependent combine of two uint32 streams."""
    a = _u32(a)
    b = _u32(b)
    return lowbias32(a ^ (b + U32(0x9E3779B9) + (a << 6) + (a >> 2)))


def pcg_hash(x):
    """PCG output permutation of an LCG step — a second independent hash."""
    x = _u32(x)
    state = x * U32(747796405) + U32(2891336453)
    word = ((state >> ((state >> 28) + U32(4))) ^ state) * U32(277803737)
    return (word >> 22) ^ word


def u32_to_unit_float(x):
    """uint32 -> f32 in [0, 1) with 24 bits of mantissa entropy.

    Routed through int32 (exact: value < 2^24 after the shift) because
    Mosaic has no u32->f32 cast — this function also runs inside the
    fused Pallas bounce kernel."""
    return (_u32(x) >> 8).astype(jnp.int32).astype(jnp.float32) \
        * jnp.float32(1.0 / (1 << 24))


# ---------------------------------------------------------------------------
# Sobol' direction vectors (first SOBOL_NDIM dims, Joe & Kuo initialisation)
# ---------------------------------------------------------------------------

SOBOL_NDIM = 8

# (s, a, m) primitive-polynomial parameters for dims 1..7 (dim 0 is the
# van der Corput radical inverse). Values from the standard Joe-Kuo table.
_JOE_KUO = [
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
]


def _make_direction_vectors() -> np.ndarray:
    """Compute 32-bit Sobol' direction vectors, shape [SOBOL_NDIM, 32]."""
    nbits = 32
    v = np.zeros((SOBOL_NDIM, nbits), dtype=np.uint64)
    # dim 0: van der Corput
    for k in range(nbits):
        v[0, k] = np.uint64(1) << np.uint64(31 - k)
    for d, (s, a, m_init) in enumerate(_JOE_KUO, start=1):
        m = list(m_init)
        for k in range(s, nbits):
            mk = m[k - s] ^ (m[k - s] << s)
            for i in range(1, s):
                if (a >> (s - 1 - i)) & 1:
                    mk ^= m[k - i] << i
            m.append(mk)
        for k in range(nbits):
            v[d, k] = np.uint64(m[k]) << np.uint64(31 - k)
    return v.astype(np.uint32)


_SOBOL_V = _make_direction_vectors()          # np [NDIM, 32] uint32


def _rev32_np(v):
    r = np.zeros_like(v)
    for b in range(32):
        r |= ((v >> np.uint32(b)) & np.uint32(1)) << np.uint32(31 - b)
    return r


_REV_SOBOL_V = _rev32_np(_SOBOL_V)            # bit-reversed vectors


INDEX_BITS = 16
"""Sample-index space is 2**INDEX_BITS: the Owen index shuffle permutes
[0, 2^16) and the direction-vector folds iterate 16 bits instead of 32
(halving the hottest integer loop in the fused bounce kernel). 65,536
samples/pixel is 16x the reference's own converged-test ceiling
(Support/tests/tests.json sampleCount 4096)."""


def sobol_u32(index, dim: int, nbits: int = 32, rev: bool = False):
    """Sobol' sample `index` in dimension `dim` (static), as uint32.

    `nbits` bounds the index (`index < 2**nbits` assumed); the fold skips
    the always-zero high bits. `rev=True` folds bit-REVERSED direction
    vectors, yielding reverse_bits_u32(sobol) at no extra cost (the Owen
    scramble wants its input in that domain — saves a per-dim reversal).

    Op diet (bit-exact, validated): dim 0's direction vectors are the
    single bits 1<<(31-k), so its XOR-fold IS a bit reversal; other dims
    replace the per-bit `bit * v_k` u32 multiply with a sign-extended
    mask AND (shift/shift/and — no VPU integer multiply). This is the
    hottest integer code in the fused bounce kernel (7+ dims per ray per
    bounce — docs/PERF_NOTES.md round-4b VPU-bound analysis)."""
    assert 0 <= dim < SOBOL_NDIM
    index = _u32(index)
    if dim == 0 and not rev:
        return reverse_bits_u32(index)   # v[0,k] == 1 << (31-k)
    if dim == 0:
        return index                     # rev(rev(index)) == index
    idx_i = index.astype(jnp.int32)
    result = jnp.zeros_like(index)
    for k in range(nbits):
        mask = jax.lax.shift_right_arithmetic(
            jax.lax.shift_left(idx_i, 31 - k), 31).astype(U32)
        v = int(_SOBOL_V[dim, k])
        if rev:
            v = int(_REV_SOBOL_V[dim, k])
        result ^= mask & U32(v)
    return result


# ---------------------------------------------------------------------------
# Hash-based Owen scrambling (Burley 2020 / Laine-Karras permutation)
# ---------------------------------------------------------------------------


def laine_karras_permutation(x, seed):
    """Seed-keyed per-bit permutation (each output bit depends only on
    lower-or-equal input bits — the Owen-scramble building block).

    This is Burley's improved variant (JCGT 2020 §3, the hash used by
    Cycles' Sobol-Burley sampler): the multiply by a seed-derived odd
    constant diffuses the seed into every bit, which the original
    Laine-Karras constants do not — with scramble-only decorrelation
    (see shuffled_scrambled_sobol_u32) the original leaves ~0.73
    cross-seed correlation; this variant measures <0.03."""
    x = _u32(x)
    seed = _u32(seed)
    x ^= x * U32(0x3D20ADEA)
    x += seed
    x *= (seed >> 16) | U32(1)
    x ^= x * U32(0x05526C56)
    x ^= x * U32(0x53A22864)
    return x


def nested_uniform_scramble(x, seed):
    """Owen scramble of the bits of x (most-significant bit first)."""
    x = reverse_bits_u32(x)
    x = laine_karras_permutation(x, seed)
    return reverse_bits_u32(x)


def _shuffle_index(index, shuffle_seed):
    """Owen shuffle of the sample index within the 2**INDEX_BITS space.

    A nested uniform scramble of the index is itself a valid shuffle: any
    prefix of the sequence maps to a dyadically-structured subset, so the
    first 2^m shuffled indices still evaluate to a (t,m,s)-net (Burley
    2020 §10.2). Restricting to the low 16 bits is sound because every
    output bit of the permutation depends only on lower-or-equal input
    bits — the low-16 restriction is a bijection on [0, 2^16).

    The shuffle (not just the scramble) is what decorrelates pixels:
    an Owen scramble keyed by two different seeds flips each point's MSB
    by a constant, leaving |corr| ~= 0.75 between streams — measured;
    different shuffled INDICES give genuinely different Sobol' points.
    """
    x = reverse_bits_u32(_u32(index)) >> U32(32 - INDEX_BITS)
    x = laine_karras_permutation(x, shuffle_seed)
    x &= U32((1 << INDEX_BITS) - 1)
    return reverse_bits_u32(x) >> U32(32 - INDEX_BITS)


def shuffled_scrambled_sobol_u32(index, seed, dim: int):
    """Owen-shuffled, Owen-scrambled Sobol' point — one dimension.

    `dim` may exceed SOBOL_NDIM: higher dims are "padded" by decorrelating
    the shuffle seed per dim-block, the standard padding construction.

    Op diet vs round 4 (the sampler measured ~63% of the fused Cornell
    frame, scripts/profile_fused.py): the shuffle and the direction-vector
    folds run in the 16-bit index space (INDEX_BITS) instead of 32, and
    the folds use bit-reversed direction vectors so their output is
    already in the Owen-scramble domain (one reversal per dim saved).
    """
    block, d = divmod(dim, SOBOL_NDIM)
    seed = _u32(seed)
    if block:
        seed = hash_combine(seed, U32((block * 0x55555555 + 0x68BC21EB)
                                      & 0xFFFFFFFF))
    shuffle_seed = lowbias32(seed ^ U32(0xA511E9B3))
    scramble_seed = hash_combine(seed, U32(d + 1))
    shuffled = _shuffle_index(index, shuffle_seed)
    # rev=True: p_rev == reverse_bits(sobol(shuffled, d)); dim 0 is free.
    p_rev = sobol_u32(shuffled, d, nbits=INDEX_BITS, rev=True)
    return reverse_bits_u32(laine_karras_permutation(p_rev, scramble_seed))


# ---------------------------------------------------------------------------
# Public sampling API
# ---------------------------------------------------------------------------


def pixel_seed(px, py, vertex_index, effect):
    """Per-(pixel, path-vertex, effect) decorrelation seed.

    Mirrors the reference generator keying (SampleGenerators.hlsli:29-41):
    pixel position, path vertex index and an effect seed; the sample index
    stays separate so that LD sequences progress over frames.
    """
    h = hash_combine(_u32(px), _u32(py))
    h = hash_combine(h, _u32(vertex_index))
    h = hash_combine(h, _u32(effect))
    return h


def ld_sample(sample_index, seed, dim: int):
    """Low-discrepancy f32 sample in [0,1)."""
    return u32_to_unit_float(shuffled_scrambled_sobol_u32(sample_index, seed, dim))


def ld_sample2(sample_index, seed, dim: int):
    """Consecutive-dim 2D LD sample (well-distributed pair)."""
    base = (dim // 2) * 2
    return ld_samples(sample_index, seed, (base, base + 1))


def ld_samples(sample_index, seed, dims):
    """Batched LD samples: shares the per-block Owen index shuffle across
    all requested dims (the shuffle is the expensive half of ld_sample)."""
    seed = _u32(seed)
    index = _u32(sample_index)
    by_block = {}
    for d in dims:
        by_block.setdefault(d // SOBOL_NDIM, []).append(d)
    out = {}
    for block, ds in by_block.items():
        sb = seed
        if block:
            sb = hash_combine(sb, U32((block * 0x55555555 + 0x68BC21EB)
                                      & 0xFFFFFFFF))
        shuffled = _shuffle_index(index, lowbias32(sb ^ U32(0xA511E9B3)))
        for d in ds:
            dd = d % SOBOL_NDIM
            cs = hash_combine(sb, U32(dd + 1))
            p_rev = sobol_u32(shuffled, dd, nbits=INDEX_BITS, rev=True)
            out[d] = u32_to_unit_float(reverse_bits_u32(
                laine_karras_permutation(p_rev, cs)))
    return tuple(out[d] for d in dims)


def uniform_sample(seed, dim):
    """Plain hash-chain uniform f32 in [0,1); `dim` may be traced."""
    return u32_to_unit_float(hash_combine(_u32(seed), _u32(dim)))


def uniform_sample_u32(seed, dim):
    return hash_combine(_u32(seed), _u32(dim))
