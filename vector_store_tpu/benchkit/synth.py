"""Relay-independent synthetic data: twin host/device generators.

The build environment reaches its TPU through a relay whose host<->device
bandwidth collapses unpredictably (minutes-long stalls; measured rates
from 0.05 to 96 MB/s), so scale benchmarks that upload gigabytes of
synthetic rows starve on transport, not on anything the benchmark
measures. This module generates the SAME clustered rows twice — once with
numpy (for the engines' host mirrors and for exact ground truth) and once
as a jitted JAX program (for the device storage) — from a shared
counter-based hash, so bulk ingest ships only scalars to the device.

Determinism: every value derives from `lowbias32`-style integer
avalanche hashing of (seed, row, component, stream) — uint32 arithmetic
wraps identically in numpy and XLA. Gaussian-ish noise comes from a CLT
sum of four uniforms (elementwise f32 adds/muls only; no transcendental
functions whose libm vs XLA rounding would diverge). Host and device
rows agree to float32 rounding (~1e-7 relative — the twin test asserts
allclose at 1e-6, NOT bitwise equality: XLA may fuse multiply-adds). The
divergence is orders of magnitude below the bf16/i8 storage quantization
step, so recall measured against the host ground truth is unaffected.

The reference's benchmark crate loads fbin/parquet datasets from disk
(crates/benchmark/src/data/mod.rs:26-107); this is the zero-egress
stand-in at the same shapes. Real-dataset loaders live in data.py.
"""

from __future__ import annotations

import functools

import numpy as np

_M1 = np.uint32(0x7FEB352D)
_M2 = np.uint32(0x846CA68B)
_GOLD = np.uint32(0x9E3779B9)


def _ava_np(x: np.ndarray) -> np.ndarray:
    """lowbias32 avalanche hash, uint32 -> uint32 (numpy twin)."""
    x = x.astype(np.uint32, copy=True)
    x ^= x >> np.uint32(16)
    x *= _M1
    x ^= x >> np.uint32(15)
    x *= _M2
    x ^= x >> np.uint32(16)
    return x


def _ava_jx(x):
    import jax.numpy as jnp

    x = x.astype(jnp.uint32)
    x = x ^ (x >> jnp.uint32(16))
    x = x * jnp.uint32(0x7FEB352D)
    x = x ^ (x >> jnp.uint32(15))
    x = x * jnp.uint32(0x846CA68B)
    x = x ^ (x >> jnp.uint32(16))
    return x


def _u01_np(h: np.ndarray) -> np.ndarray:
    """uint32 -> f32 in [0, 1): top 24 bits scaled by 2^-24 (exact in f32)."""
    return (h >> np.uint32(8)).astype(np.float32) * np.float32(5.9604645e-8)


def _noise_np(seed: int, rows: np.ndarray, cols: np.ndarray) -> np.ndarray:
    """CLT noise ~ N(0, 1): (sum of 4 uniforms - 2) * sqrt(3).
    rows [n,1] and cols [1,m] broadcast to [n, m]."""
    base = _ava_np(rows ^ np.uint32(seed & 0xFFFFFFFF))
    cell = base ^ (cols * _GOLD)
    acc = None
    for s in range(4):
        u = _u01_np(_ava_np(cell ^ np.uint32((s * 0x68BC21EB) & 0xFFFFFFFF)))
        acc = u if acc is None else acc + u
    return (acc - np.float32(2.0)) * np.float32(1.7320508)


def _noise_jx(seed: int, rows, cols):
    import jax.numpy as jnp

    base = _ava_jx(rows ^ jnp.uint32(seed & 0xFFFFFFFF))
    cell = base ^ (cols * jnp.uint32(0x9E3779B9))
    acc = None
    for s in range(4):
        u = (
            _ava_jx(cell ^ jnp.uint32((s * 0x68BC21EB) & 0xFFFFFFFF)) >> jnp.uint32(8)
        ).astype(jnp.float32) * jnp.float32(5.9604645e-8)
        acc = u if acc is None else acc + u
    return (acc - jnp.float32(2.0)) * jnp.float32(1.7320508)


def synth_assign_np(seed: int, lo: int, hi: int, n_centers: int) -> np.ndarray:
    """Cluster assignment per row id (int64 row ids folded to uint32 —
    shapes here stay under 2^32 rows)."""
    ids = np.arange(lo, hi, dtype=np.uint32)
    return (
        _ava_np(ids ^ np.uint32((seed ^ 0x5BD1E995) & 0xFFFFFFFF)) % np.uint32(n_centers)
    ).astype(np.int32)


def synth_centers_np(seed: int, n_centers: int, d: int) -> np.ndarray:
    """[n_centers, d] f32 with rows of ~unit norm (gaussian / sqrt(d))."""
    rows = np.arange(n_centers, dtype=np.uint32)[:, None]
    cols = np.arange(d, dtype=np.uint32)[None, :]
    g = _noise_np(seed ^ 0x1234567, rows, cols)
    return g * np.float32(1.0 / np.sqrt(d))


def embedding_sigma(d: int, spread: float = 0.4) -> float:
    """Per-component noise scale giving |noise| ~= spread * |center|.

    Real embedding datasets (the reference benchmarks on DBpedia-OpenAI
    1536-d, Deep 96-d) have strong local structure: exact-vs-quantized
    recall@10 stays >= 0.99 for bf16. A FIXED per-component sigma loses
    that property as d grows (|noise| = sigma*sqrt(d) swamps the unit
    center at high d, collapsing all pairwise distances toward 1.0 —
    harder than any real dataset, and meaninglessly so). Centers here are
    ~unit norm, so sigma = spread/sqrt(d) keeps the cluster geometry
    dimension-invariant."""
    return spread / float(np.sqrt(d))


def synth_rows_np(
    seed: int, lo: int, hi: int, d: int, n_centers: int, sigma: float | None = None
) -> np.ndarray:
    """[hi-lo, d] f32 clustered rows (NOT normalized): center + sigma*noise.

    Generated in ~50 MB row sub-blocks: the hash pipeline materializes
    several same-shaped uint32/f32 temporaries per round, and at
    [131072, 1536] each temp is 800 MB — numpy returns blocks that size
    to the OS on free, so every round re-mmaps and first-touch-faults
    gigabytes (measured 567 s/chunk vs 25 s extrapolated from small
    blocks). Sub-blocking keeps temps cache/TLB-friendly."""
    if sigma is None:
        sigma = embedding_sigma(d)
    centers = synth_centers_np(seed, n_centers, d)
    assign = synth_assign_np(seed, lo, hi, n_centers)
    out = np.empty((hi - lo, d), dtype=np.float32)
    cols = np.arange(d, dtype=np.uint32)[None, :]
    step = max(1, (8 << 20) // max(d * 4, 1))  # ~8M f32 elements per block
    for blo in range(lo, hi, step):
        bhi = min(blo + step, hi)
        rows = np.arange(blo, bhi, dtype=np.uint32)[:, None]
        noise = _noise_np(seed, rows, cols)
        b = slice(blo - lo, bhi - lo)
        np.multiply(noise, np.float32(sigma), out=out[b])
        out[b] += centers[assign[b]]
    return out


@functools.partial(
    __import__("jax").jit,
    static_argnames=("seed", "n", "d", "n_centers", "sigma"),
)
def _rows_jx(lo, *, seed: int, n: int, d: int, n_centers: int, sigma: float):
    import jax.numpy as jnp

    crows = jnp.arange(n_centers, dtype=jnp.uint32)[:, None]
    cols = jnp.arange(d, dtype=jnp.uint32)[None, :]
    g = _noise_jx(seed ^ 0x1234567, crows, cols)
    centers = g * jnp.float32(1.0 / np.sqrt(d))
    ids = lo.astype(jnp.uint32) + jnp.arange(n, dtype=jnp.uint32)
    assign = (
        _ava_jx(ids ^ jnp.uint32((seed ^ 0x5BD1E995) & 0xFFFFFFFF))
        % jnp.uint32(n_centers)
    ).astype(jnp.int32)
    noise = _noise_jx(seed, ids[:, None], cols)
    return centers[assign] + noise * jnp.float32(sigma)


def synth_rows_jax(
    seed: int, lo: int, hi: int, d: int, n_centers: int, sigma: float | None = None
):
    """Device twin of synth_rows_np: [hi-lo, d] f32 ON DEVICE, generated
    by a jitted program whose only input is the scalar `lo` (a new chunk
    costs ~8 bytes of uplink)."""
    import jax.numpy as jnp

    if sigma is None:
        sigma = embedding_sigma(d)
    return _rows_jx(
        jnp.uint32(lo),
        seed=int(seed),
        n=int(hi - lo),
        d=int(d),
        n_centers=int(n_centers),
        sigma=float(sigma),
    )


def rows_file_np(
    seed: int,
    n: int,
    d: int,
    n_centers: int,
    sigma: float | None = None,
    cache_dir: str = "scale_logs",
) -> np.ndarray:
    """The benchmark 'dataset file': host rows generated ONCE to disk,
    then memory-mapped — the zero-egress equivalent of the reference
    benchmark crate's fbin datasets sitting on disk before `build-index`
    runs (crates/benchmark/src/data/fbin.rs:23-45). Dataset acquisition is
    thereby outside the measured ingest/build window, exactly as it is for
    the reference; the device twin (synth_rows_jax) still generates
    on-device from scalars. Returns a read-only [n, d] f32 memmap."""
    import os

    os.makedirs(cache_dir, exist_ok=True)
    tag = f"rows-s{seed}-{n}x{d}-c{n_centers}"
    if sigma is not None:
        tag += f"-sg{sigma:g}"
    path = os.path.join(cache_dir, tag + ".f32")
    nbytes = n * d * 4
    if os.path.exists(path) and os.path.getsize(path) == nbytes:
        return np.memmap(path, dtype=np.float32, mode="r", shape=(n, d))
    tmp = path + ".tmp"
    mm = np.memmap(tmp, dtype=np.float32, mode="w+", shape=(n, d))
    chunk = 131072
    for lo in range(0, n, chunk):
        hi = min(lo + chunk, n)
        mm[lo:hi] = synth_rows_np(seed, lo, hi, d, n_centers, sigma)
    mm.flush()
    del mm
    os.replace(tmp, path)
    return np.memmap(path, dtype=np.float32, mode="r", shape=(n, d))
