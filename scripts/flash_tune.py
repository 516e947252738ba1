"""Kernel-variant tuning for the MV-VDM attention hot spots (round 4).

Round-3 attribution (docs/denoise_roofline.md): the denoise step spends
~278 ms in the L0 cross-view flash kernel (60% of peak on padded work —
the softmax VPU passes serialize after the MXU dots) and ~71 ms in the
packed temporal attention (XLA materializes the packed (G, H, 128, 128)
f32 probabilities in HBM: ~1 GB of traffic per call). This script measures
candidate kernels on the real chip at the exact production shapes; winners
graduate into ops/attention.py behind the existing parity tests.

Usage:  python scripts/flash_tune.py [--quick]
Writes: docs/flash_tune.json
"""

from __future__ import annotations

import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def chain_bench(step_fn, x0, iters=8):
    """Two-point chained-jit timing (bench.py scheme) — cancels dispatch
    overhead and tunnel latency; returns sec/iter."""
    import jax
    import jax.numpy as jnp

    def make(n):
        @jax.jit
        def run(x):
            def body(i, x):
                y = step_fn(x)
                return 0.999 * x + 0.001 * y.astype(x.dtype)
            out = jax.lax.fori_loop(0, n, body, x)
            return jnp.sum(out.astype(jnp.float32))
        return run

    n1, n2 = 1, 1 + iters
    r1, r2 = make(n1), make(n2)
    float(r1(x0)), float(r2(x0))
    x1 = x0 + x0.dtype.type(1e-5)
    t0 = time.perf_counter(); float(r1(x1)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(r2(x1)); t2 = time.perf_counter() - t0
    return max(t2 - t1, 1e-9) / iters


# ---------------------------------------------------------------------------
# Cross-view whole-K variants (L0 shape: (32, 4096, 320), 8 heads of 40)
# ---------------------------------------------------------------------------


def make_wholek_variant(block_q=256, bf16_p=False, skip_max=False,
                        k_chunks=1, clamp=None):
    """Returns fn(q, k, v, scale) on (B, H, S, D) — a whole-K dense kernel
    variant. All K/V in VMEM; optional in-body k-chunking (unrolled online
    softmax, lets Mosaic interleave the next chunk's MXU dot with this
    chunk's VPU passes); optional bf16 probabilities; optional skip-max
    (exact when |s·scale| < ~100 — scores are bounded for trained nets);
    optional clamp (fused into the exp2 pass) that makes skip-max
    overflow-safe for arbitrary inputs."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    log2e = 1.4426950408889634

    def kernel(q_ref, k_ref, v_ref, o_ref, *, scale):
        q = q_ref[0]
        qs = (q.astype(jnp.float32) * (scale * log2e)).astype(q.dtype)
        if k_chunks == 1:
            k = k_ref[0]
            v = v_ref[0]
            s = jnp.dot(qs, k.T, preferred_element_type=jnp.float32)
            if skip_max and clamp is not None:
                p = jnp.exp2(jnp.minimum(s, clamp))
            elif skip_max:
                p = jnp.exp2(s)
            else:
                m = jnp.max(s, axis=-1, keepdims=True)
                p = jnp.exp2(s - m)
            if bf16_p:
                p16 = p.astype(v.dtype)
                l = jnp.sum(p16.astype(jnp.float32), axis=-1, keepdims=True)
                acc = jnp.dot(p16, v, preferred_element_type=jnp.float32)
            else:
                l = jnp.sum(p, axis=-1, keepdims=True)
                acc = jnp.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32)
            o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        else:
            sk = k_ref.shape[1]
            ck = sk // k_chunks
            # unrolled online softmax across k-chunks: chunk i+1's QKᵀ has no
            # data dependency on chunk i's softmax → scheduler may overlap
            acc = None
            m_run = None
            l_run = None
            for i in range(k_chunks):
                k_blk = k_ref[0, i * ck:(i + 1) * ck, :]
                v_blk = v_ref[0, i * ck:(i + 1) * ck, :]
                s = jnp.dot(qs, k_blk.T, preferred_element_type=jnp.float32)
                m_cur = jnp.max(s, axis=-1, keepdims=True)
                if m_run is None:
                    m_new = m_cur
                else:
                    m_new = jnp.maximum(m_run, m_cur)
                p = jnp.exp2(s - m_new)
                pv = jnp.dot(p.astype(v_blk.dtype), v_blk,
                             preferred_element_type=jnp.float32)
                if acc is None:
                    acc = pv
                    l_run = jnp.sum(p, axis=-1, keepdims=True)
                else:
                    alpha = jnp.exp2(m_run - m_new)
                    acc = acc * alpha + pv
                    l_run = l_run * alpha + jnp.sum(p, axis=-1, keepdims=True)
                m_run = m_new
            o_ref[0] = (acc / jnp.maximum(l_run, 1e-30)).astype(o_ref.dtype)

    def fn(q, k, v, scale):
        b, h, sq, d = q.shape
        sk = k.shape[2]
        dp = 128 * ((d + 127) // 128)
        pad = [(0, 0), (0, 0), (0, 0), (0, dp - d)]
        qf = jnp.pad(q, pad).reshape(b * h, sq, dp)
        kf = jnp.pad(k, pad).reshape(b * h, sk, dp)
        vf = jnp.pad(v, pad).reshape(b * h, sk, dp)
        out = pl.pallas_call(
            functools.partial(kernel, scale=scale),
            grid=(b * h, sq // block_q),
            in_specs=[
                pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, block_q, dp), lambda i, j: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b * h, sq, dp), q.dtype),
            interpret=jax.default_backend() != "tpu",
        )(qf, kf, vf)
        return out[:, :, :d].reshape(b, h, sq, d)

    return fn


def bench_cross_view(results, quick=False):
    import jax
    import jax.numpy as jnp
    from animate3d_tpu.ops.attention import (
        _flash_attention, attention_xla, _split_heads)

    shapes = [("L0", 32, 4096, 320, 8)]
    if not quick:
        shapes.append(("L1", 32, 1024, 640, 8))
    for name, b, s, c, h in shapes:
        d = c // h
        scale = d ** -0.5
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, h, s, d)), jnp.bfloat16)
        # reference = the current production flash kernel (materializing the
        # XLA (32, 8, 4096, 4096) f32 logits at L0 is 16 GB — over HBM);
        # its own parity vs XLA is covered by tests/test_attention.py
        ref = _flash_attention(q, k, v, scale)

        def check(fn):
            out = fn(q, k, v, scale)
            err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                        - ref.astype(jnp.float32))))
            return err

        variants = {
            "current": lambda q, k, v, s=scale: _flash_attention(q, k, v, s),
            "bq512": make_wholek_variant(block_q=512),
            "bq256_bf16p": make_wholek_variant(block_q=256, bf16_p=True),
            "bq512_bf16p": make_wholek_variant(block_q=512, bf16_p=True),
            "bq256_skipmax": make_wholek_variant(block_q=256, skip_max=True,
                                                 bf16_p=True),
            "bq256_skipmax_f32": make_wholek_variant(block_q=256,
                                                     skip_max=True),
            "bq256_skipmax_clip": make_wholek_variant(block_q=256,
                                                      skip_max=True,
                                                      clamp=100.0),
            "bq512_skipmax_f32": make_wholek_variant(block_q=512,
                                                     skip_max=True),
            "bq256_chunk2": make_wholek_variant(block_q=256, k_chunks=2),
            "bq512_chunk2": make_wholek_variant(block_q=512, k_chunks=2),
            "bq256_chunk4": make_wholek_variant(block_q=256, k_chunks=4),
            "bq512_chunk2_bf16p": make_wholek_variant(block_q=512, k_chunks=2,
                                                      bf16_p=True),
        }
        only = None
        if "--only" in sys.argv:
            only = sys.argv[sys.argv.index("--only") + 1].split(",")
        for vn, fn in variants.items():
            if only is not None and not any(pat in vn for pat in only):
                continue
            try:
                err = check(fn)
                sec = chain_bench(lambda x, fn=fn: fn(x, k, v, scale), q,
                                  iters=8 if quick else 24)
                results[f"cross_{name}_{vn}_ms"] = round(sec * 1e3, 3)
                results[f"cross_{name}_{vn}_err"] = round(err, 5)
                print(f"cross {name} {vn}: {sec*1e3:.3f} ms  max|Δ|={err:.2e}",
                      flush=True)
            except Exception as e:
                print(f"cross {name} {vn}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                results[f"cross_{name}_{vn}_ms"] = None


# ---------------------------------------------------------------------------
# Packed temporal attention (L0 shape: (8192, 16, 320), 8 heads of 40)
# ---------------------------------------------------------------------------


def bench_temporal(results, quick=False):
    import jax
    import jax.numpy as jnp
    from animate3d_tpu.ops.attention import (
        _packed_small_attention, packed_temporal_flash, attention_xla,
        _split_heads, _merge_heads)

    shapes = [("L0", 8192, 16, 320, 8)]
    if not quick:
        shapes += [("L1", 2048, 16, 640, 8), ("L2", 512, 16, 1280, 8)]
    for name, b, s, c, h in shapes:
        d = c // h
        scale = d ** -0.5
        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(b, s, c)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(b, s, c)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(b, s, c)), jnp.bfloat16)
        ref = _merge_heads(attention_xla(
            _split_heads(q, h), _split_heads(k, h), _split_heads(v, h), scale))

        variants = {
            "xla_packed": lambda q, k, v: _packed_small_attention(
                q, k, v, h, scale),
            "pallas": lambda q, k, v: packed_temporal_flash(q, k, v, h, scale),
        }
        for vn, fn in variants.items():
            try:
                out = fn(q, k, v)
                err = float(jnp.max(jnp.abs(out.astype(jnp.float32)
                                            - ref.astype(jnp.float32))))
                sec = chain_bench(lambda x, fn=fn: fn(x, k, v), q,
                                  iters=8 if quick else 24)
                results[f"temporal_{name}_{vn}_ms"] = round(sec * 1e3, 3)
                results[f"temporal_{name}_{vn}_err"] = round(err, 5)
                print(f"temporal {name} {vn}: {sec*1e3:.3f} ms  "
                      f"max|Δ|={err:.2e}", flush=True)
            except Exception as e:
                print(f"temporal {name} {vn}: FAILED {type(e).__name__}: {e}",
                      flush=True)
                results[f"temporal_{name}_{vn}_ms"] = None


def main():
    import jax

    from animate3d_tpu.core.runtime import configure_persistent_cache
    configure_persistent_cache()
    quick = "--quick" in sys.argv
    results = {}
    if "--cross-only" not in sys.argv:
        bench_temporal(results, quick)
    bench_cross_view(results, quick)
    out_path = "docs/flash_tune.json"
    try:  # merge so partial (e.g. --cross-only) runs keep earlier results
        with open(out_path) as f:
            prev = json.load(f)
        prev.update(results)
        results = prev
    except (OSError, json.JSONDecodeError):
        pass
    with open(out_path, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
