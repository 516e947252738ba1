"""Microbenchmarks for the MV-VDM denoise step's components on TPU.

Times each attention/conv/norm/layout component at the FULL-SCALE denoise
shapes (CFG pair: b=2, n=4 views, f=16 frames, 32x32 latents, SD1.5
channels) with ``bench.chain_bench`` (memoization-safe two-point timing
through the axon tunnel), then attributes the measured full-step time
across components using the per-level site counts.

Usage:  python scripts/denoise_microbench.py [component ...]
        (no args = all; writes docs/denoise_microbench.json)

Shapes per level (site counts from models/unet_mv.py topology — SD1.5:
5 transformer blocks at L0/L1, 6 at L2+mid; 21 motion modules x 2 attns):

  cross-view attn1 + motion spatial:  (b f, n*l, c)  = (32, 4096/1024/256, C)
  temporal attention:                 (b n h w, f, c) = (8192/2048/512, 16, C)
  text cross-attention:               (b n f, l, c)   = (128, 1024/256/64, C)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from bench import chain_bench, program_tflops

# (level, batch, seq, channels, heads) for the cross-view layout (b f)(n l)c
CROSS_VIEW = [(0, 32, 4096, 320, 8), (1, 32, 1024, 640, 8),
              (2, 32, 256, 1280, 8)]
# temporal layout (b n h w) f c
TEMPORAL = [(0, 8192, 16, 320, 8), (1, 2048, 16, 640, 8),
            (2, 512, 16, 1280, 8)]
# text cross layout (b n f) l c, 77 kv tokens projected to c
TEXT = [(0, 128, 1024, 320, 8), (1, 128, 256, 640, 8), (2, 128, 64, 1280, 8)]
# per-step call counts per level [attn1+motion_sp, temporal, text]
N_CROSS = {0: 15, 1: 15, 2: 18}   # 5/5/6 attn1 + 10/10/12 motion spatial
N_TEMPORAL = {0: 10, 1: 10, 2: 22}
N_TEXT = {0: 5, 1: 5, 2: 6}


def _rng(*shape):
    return np.random.default_rng(0).normal(size=shape).astype(np.float32)


def bench_attention(batch, seq, ch, heads, backend, kv_seq=None):
    import jax.numpy as jnp
    from animate3d_tpu.ops.attention import multi_head_attention

    q = jnp.asarray(_rng(batch, seq, ch), jnp.bfloat16)
    kv = q if kv_seq is None else jnp.asarray(_rng(batch, kv_seq, ch),
                                              jnp.bfloat16)
    fn = lambda kvc, x: multi_head_attention(x, kvc, kvc, heads,
                                             backend=backend)
    sec = chain_bench(fn, q, iters=20, consts=kv)
    return sec


def bench_conv(batch=128, res=32, cin=320, cout=320):
    import jax
    import jax.numpy as jnp

    x = jnp.asarray(_rng(batch, res, res, cin), jnp.bfloat16)
    w = jnp.asarray(_rng(3, 3, cin, cout), jnp.bfloat16)

    def fn(w, x):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    sec = chain_bench(fn, x, iters=20, consts=w)
    tf = program_tflops(lambda w, x: fn(w, x), w, x)
    return sec, tf / sec if tf else 0.0


def bench_groupnorm(batch=128, res=32, ch=320, groups=32):
    import jax.numpy as jnp

    x = jnp.asarray(_rng(batch, res, res, ch), jnp.bfloat16)
    scale = jnp.ones((ch,), jnp.float32)

    def fn(scale, x):
        xf = x.astype(jnp.float32).reshape(x.shape[0], res * res, groups,
                                           ch // groups)
        mu = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.mean((xf - mu) ** 2, axis=(1, 3), keepdims=True)
        out = (xf - mu) * jax.lax.rsqrt(var + 1e-5)
        return (out.reshape(x.shape) * scale).astype(x.dtype)

    import jax
    return chain_bench(fn, x, iters=20, consts=scale)


def bench_transpose():
    """(b n f) l c -> (b f) (n l) c -> back: the cross-view layout shuffle."""
    import jax.numpy as jnp

    x = jnp.asarray(_rng(128, 1024, 320), jnp.bfloat16)

    def fn(_, x):
        b, n, f, l, c = 2, 4, 16, 1024, 320
        y = x.reshape(b, n, f, l, c).transpose(0, 2, 1, 3, 4).reshape(
            b * f, n * l, c)
        y = y * 1.000001
        return y.reshape(b, f, n, l, c).transpose(0, 2, 1, 3, 4).reshape(
            b * n * f, l, c)

    return chain_bench(fn, x, iters=20, consts=jnp.zeros(()))


def bench_geglu(batch=128, seq=1024, ch=320):
    import jax.numpy as jnp

    x = jnp.asarray(_rng(batch, seq, ch), jnp.bfloat16)
    w1 = jnp.asarray(_rng(ch, ch * 8) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(_rng(ch * 4, ch) * 0.02, jnp.bfloat16)

    def fn(ws, x):
        import jax.nn
        w1, w2 = ws
        proj = x @ w1
        h, g = jnp.split(proj, 2, axis=-1)
        return (h * jax.nn.gelu(g, approximate=False)) @ w2

    return chain_bench(fn, x, iters=20, consts=(w1, w2))


def bench_geglu_fused(batch=128, seq=1024, ch=320):
    """Fused Pallas GEGLU (ops/geglu.py) at the same L0 shapes."""
    import jax.numpy as jnp

    from animate3d_tpu.ops.geglu import _geglu_fused

    x = jnp.asarray(_rng(batch, seq, ch), jnp.bfloat16)
    w1 = jnp.asarray(_rng(ch, ch * 8) * 0.02, jnp.bfloat16)
    b1 = jnp.zeros((ch * 8,), jnp.bfloat16)
    w2 = jnp.asarray(_rng(ch * 4, ch) * 0.02, jnp.bfloat16)
    b2 = jnp.zeros((ch,), jnp.bfloat16)

    def fn(ws, x):
        w1, b1, w2, b2 = ws
        y = _geglu_fused(jnp.bfloat16, x.reshape(-1, x.shape[-1]),
                         w1, b1, w2, b2)
        return y.reshape(x.shape)

    return chain_bench(fn, x, iters=20, consts=(w1, b1, w2, b2))


def bench_motion_layout(lvl, ch, hw, fused=False, bn=8, f=16):
    """MotionModule layout chain: (bn·f, hw, c) conv activations →
    proj_in → temporal tokens (bn·hw, f, c) → proj_out → back.

    ``fused=False`` is the production path (explicit transpose, then plain
    matmul); ``fused=True`` rides both layout moves on the projections as
    permuted-output einsums so the transpose becomes the dot_general's
    output layout instead of a separate HBM pass."""
    import jax.numpy as jnp

    x = jnp.asarray(_rng(bn * f, hw, ch), jnp.bfloat16)
    w_in = jnp.asarray(_rng(ch, ch) * 0.02, jnp.bfloat16)
    w_out = jnp.asarray(_rng(ch, ch) * 0.02, jnp.bfloat16)

    if fused:
        def fn(ws, x):
            w_in, w_out = ws
            xr = x.reshape(bn, f, hw, ch)
            h = jnp.einsum("bfxc,cd->bxfd", xr, w_in)  # (bn, hw, f, c)
            h = h * 1.000001  # stand-in for the temporal attention
            y = jnp.einsum("bxfd,dc->bfxc", h, w_out)
            return y.reshape(bn * f, hw, ch)
    else:
        def fn(ws, x):
            w_in, w_out = ws
            h = (x.reshape(bn, f, hw, ch).transpose(0, 2, 1, 3)
                 .reshape(bn * hw, f, ch))
            h = h @ w_in
            h = h * 1.000001
            h = h @ w_out
            return (h.reshape(bn, hw, f, ch).transpose(0, 2, 1, 3)
                    .reshape(bn * f, hw, ch))

    return chain_bench(fn, x, iters=20, consts=(w_in, w_out))


def bench_spatial_layout(lvl, ch, hw, fused=False, bn=8, f=16, n=4):
    """SpatioTemporalAttention spatial-branch move: temporal tokens
    (bn·hw, f, c) → (b·f, n·hw, c) for the cross-view spatial attention and
    back, around its q projection (the k/v/out projections pay the same)."""
    import jax.numpy as jnp

    b = bn // n
    x = jnp.asarray(_rng(bn * hw, f, ch), jnp.bfloat16)
    w = jnp.asarray(_rng(ch, ch) * 0.02, jnp.bfloat16)
    w2 = jnp.asarray(_rng(ch, ch) * 0.02, jnp.bfloat16)

    if fused:
        def fn(ws, x):
            w, w2 = ws
            xr = x.reshape(b, n * hw, f, ch)
            q = jnp.einsum("bsfc,cd->bfsd", xr, w)  # (b, f, n·hw, d)
            q = q * 1.000001  # stand-in for the spatial attention
            y = jnp.einsum("bfsd,dc->bsfc", q, w2)
            return y.reshape(bn * hw, f, ch)
    else:
        def fn(ws, x):
            w, w2 = ws
            xs = (x.reshape(b, n * hw, f, ch).transpose(0, 2, 1, 3)
                  .reshape(b * f, n * hw, ch))
            h = (xs @ w) * 1.000001
            h = h @ w2
            return (h.reshape(b, f, n * hw, ch).transpose(0, 2, 1, 3)
                    .reshape(bn * hw, f, ch))

    return chain_bench(fn, x, iters=20, consts=(w, w2))


def bench_temporal_chain(batch, seq, ch, heads, padded):
    """Full temporal-attention chain (q/k/v projections → attention →
    out-projection): the production unpadded path (separate matmuls + XLA
    packed attention) vs the lane-padded fused path (padded projections →
    packed_temporal_flash_padded → row-padded out-projection)."""
    import jax.numpy as jnp
    from animate3d_tpu.models.attention_layers import (_pad_head_cols,
                                                       _pad_head_rows)
    from animate3d_tpu.ops.attention import (multi_head_attention,
                                             packed_temporal_flash_padded)

    x = jnp.asarray(_rng(batch, seq, ch), jnp.bfloat16)
    ws = [jnp.asarray(_rng(ch, ch) * 0.02, jnp.bfloat16) for _ in range(4)]
    scale = (ch // heads) ** -0.5

    if padded:
        wq, wk, wv = (_pad_head_cols(w, heads) for w in ws[:3])
        wo = _pad_head_rows(ws[3], heads)

        def fn(consts, x):
            wq, wk, wv, wo = consts
            h = packed_temporal_flash_padded(x @ wq, x @ wk, x @ wv, heads,
                                             scale)
            return h @ wo

        return chain_bench(fn, x, iters=20, consts=(wq, wk, wv, wo))

    def fn(consts, x):
        wq, wk, wv, wo = consts
        h = multi_head_attention(x @ wq, x @ wk, x @ wv, heads,
                                 backend="packed")
        return h @ wo

    return chain_bench(fn, x, iters=20, consts=tuple(ws))


def bench_qkv(batch=32, seq=4096, ch=320, fused=False):
    """3 shared-input projections as separate matmuls vs one concatenated
    matmul (attention_layers._shared_input_proj)."""
    import jax.numpy as jnp

    x = jnp.asarray(_rng(batch, seq, ch), jnp.bfloat16)
    ws = tuple(jnp.asarray(_rng(ch, ch) * 0.02, jnp.bfloat16)
               for _ in range(3))

    if fused:
        def fn(ws, x):
            w = jnp.concatenate(ws, axis=1)
            out = x @ w
            q, k, v = jnp.split(out, 3, axis=-1)
            return q + k + v
    else:
        def fn(ws, x):
            return x @ ws[0] + x @ ws[1] + x @ ws[2]

    return chain_bench(fn, x, iters=20, consts=ws)


def main(argv):
    import jax

    from animate3d_tpu.core.runtime import configure_persistent_cache
    configure_persistent_cache()
    sel = set(argv) if argv else None
    want = lambda name: sel is None or name in sel
    # merge into the existing results so partial runs (one component at a
    # time around tunnel stalls) accumulate instead of clobbering
    path = os.path.join("docs", "denoise_microbench.json")
    out = {}
    if os.path.exists(path):
        with open(path) as f:
            out = json.load(f)

    if want("cross"):
        for lvl, b, s, c, h in CROSS_VIEW:
            for backend in ("flash", "xla"):
                if backend == "flash" and s % 512 != 0:
                    continue
                sec = bench_attention(b, s, c, h, backend)
                out[f"cross_L{lvl}_{backend}_ms"] = round(sec * 1e3, 3)
                print(f"cross-view L{lvl} ({b},{s},{c}) {backend}: "
                      f"{sec*1e3:.2f} ms x{N_CROSS[lvl]}/step")
    if want("temporal"):
        for lvl, b, s, c, h in TEMPORAL:
            for backend in ("xla", "packed"):
                sec = bench_attention(b, s, c, h, backend)
                key = (f"temporal_L{lvl}_ms" if backend == "xla"
                       else f"temporal_L{lvl}_{backend}_ms")
                out[key] = round(sec * 1e3, 3)
                print(f"temporal L{lvl} ({b},{s},{c}) {backend}: "
                      f"{sec*1e3:.2f} ms x{N_TEMPORAL[lvl]}/step")
    if want("text"):
        for lvl, b, s, c, h in TEXT:
            sec = bench_attention(b, s, c, h, "xla", kv_seq=77)
            out[f"text_L{lvl}_ms"] = round(sec * 1e3, 3)
            print(f"text L{lvl} ({b},{s},{c}): {sec*1e3:.2f} ms "
                  f"x{N_TEXT[lvl]}/step")
    if want("conv"):
        for cin, cout, res, tag in ((320, 320, 32, "L0"), (640, 640, 16, "L1"),
                                    (1280, 1280, 8, "L2")):
            sec, tfs = bench_conv(128, res, cin, cout)
            out[f"conv_{tag}_ms"] = round(sec * 1e3, 3)
            out[f"conv_{tag}_tflops"] = round(tfs, 1)
            print(f"conv3x3 {tag} (128,{res},{res},{cin}->{cout}): "
                  f"{sec*1e3:.2f} ms @ {tfs:.0f} TF/s")
    if want("groupnorm"):
        sec = bench_groupnorm()
        out["groupnorm_L0_ms"] = round(sec * 1e3, 3)
        print(f"groupnorm L0 (128,32,32,320): {sec*1e3:.2f} ms")
    if want("transpose"):
        sec = bench_transpose()
        out["transpose_roundtrip_ms"] = round(sec * 1e3, 3)
        print(f"cross-view transpose roundtrip: {sec*1e3:.2f} ms")
    if want("geglu"):
        sec = bench_geglu()
        out["geglu_L0_ms"] = round(sec * 1e3, 3)
        print(f"GEGLU FF L0 (128,1024,320): {sec*1e3:.2f} ms")
        for ch, res, tag in ((320, 32, "L0"), (640, 16, "L1"), (1280, 8, "L2")):
            sec = bench_geglu_fused(128, res * res, ch)
            out[f"geglu_{tag}_fused_ms"] = round(sec * 1e3, 3)
            print(f"GEGLU fused {tag} (128,{res*res},{ch}): {sec*1e3:.2f} ms")
            if tag != "L0":
                sec = bench_geglu(128, res * res, ch)
                out[f"geglu_{tag}_ms"] = round(sec * 1e3, 3)
                print(f"GEGLU xla {tag} (128,{res*res},{ch}): {sec*1e3:.2f} ms")
    if want("layout"):
        for lvl, ch, hw in ((0, 320, 1024), (1, 640, 256), (2, 1280, 64)):
            for fused in (False, True):
                tag = "einsum" if fused else "transpose"
                sec = bench_motion_layout(lvl, ch, hw, fused=fused)
                out[f"motion_layout_L{lvl}_{tag}_ms"] = round(sec * 1e3, 3)
                print(f"motion layout L{lvl} {tag}: {sec*1e3:.2f} ms")
                sec = bench_spatial_layout(lvl, ch, hw, fused=fused)
                out[f"spatial_layout_L{lvl}_{tag}_ms"] = round(sec * 1e3, 3)
                print(f"spatial layout L{lvl} {tag}: {sec*1e3:.2f} ms")
    if want("tchain"):
        for lvl, b, s, c, h in TEMPORAL:
            if c // h >= 128:
                continue  # L2 160-dim heads: no lane padding possible
            for padded in (False, True):
                tag = "padded" if padded else "xla_packed"
                sec = bench_temporal_chain(b, s, c, h, padded)
                out[f"tchain_L{lvl}_{tag}_ms"] = round(sec * 1e3, 3)
                print(f"temporal chain L{lvl} ({b},{s},{c}) {tag}: "
                      f"{sec*1e3:.2f} ms x{N_TEMPORAL[lvl]}/step")
    if want("qkv"):
        for fused in (False, True):
            sec = bench_qkv(fused=fused)
            key = "qkv_L0_fused_ms" if fused else "qkv_L0_separate_ms"
            out[key] = round(sec * 1e3, 3)
            print(f"qkv L0 (32,4096,320) {'fused' if fused else 'separate'}: "
                  f"{sec*1e3:.2f} ms")

    # attribution summary
    tot = 0.0
    for lvl in (0, 1, 2):
        best_cross = min(v for k, v in out.items()
                         if k.startswith(f"cross_L{lvl}")) if any(
            k.startswith(f"cross_L{lvl}") for k in out) else 0.0
        tot += best_cross * N_CROSS[lvl]
        temporal = [v for k, v in out.items()
                    if k.startswith(f"temporal_L{lvl}")]
        tot += (min(temporal) if temporal else 0.0) * N_TEMPORAL[lvl]
        tot += out.get(f"text_L{lvl}_ms", 0.0) * N_TEXT[lvl]
    print(f"\nattention total (best backends x counts): {tot:.1f} ms/step")
    out["attention_total_ms"] = round(tot, 1)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main(sys.argv[1:])
