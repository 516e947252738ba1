"""Per-op profile of the MV-VDM denoise step on the real TPU.

Captures a ``jax.profiler`` device trace of a few full denoise steps and
reduces the XSpace to a per-HLO-op attribution (self-time, category), so the
"residual glue" in docs/denoise_roofline.md stops being a subtraction and
becomes a ranked list of actual ops to fuse/eliminate.

Usage:
  python scripts/profile_denoise.py --smoke   # tiny matmul: is device
                                              # tracing available at all
                                              # through the axon tunnel?
  python scripts/profile_denoise.py           # full denoise step
Writes docs/denoise_profile.json (top ops by self time + category rollup).
"""

from __future__ import annotations

import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

TRACE_DIR = "/tmp/animate3d_profile"
N_TRACE_STEPS = 2  # steps inside the trace (keep in sync with _capture n=)


def _capture(step, args, n=3):
    import jax

    # warm up (compile) outside the trace
    jax.block_until_ready(step(*args))
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(n):
            out = step(*args)
        jax.block_until_ready(out)


def _find_xspace():
    paths = sorted(glob.glob(os.path.join(
        TRACE_DIR, "plugins/profile/*/*.xplane.pb")),
        key=os.path.getmtime)
    return paths[-1] if paths else None


def _parse_xspace(path):
    """Reduce the XSpace proto to per-op stats rows (list of dicts).

    xprof's framework_op_stats tool emits a gviz DataTable JSON (despite the
    csv tqx hint); flatten it to [{col_id: value}].
    """
    from xprof.convert import raw_to_tool_data as rttd

    data, _ = rttd.xspace_to_tool_data([path], "framework_op_stats",
                                       {"tqx": "out:csv;"})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    tables = json.loads(data)
    tbl = tables[0] if isinstance(tables, list) else tables
    cols = [c["id"] for c in tbl["cols"]]
    rows = []
    for r in tbl["rows"]:
        rows.append({cid: (cell or {}).get("v")
                     for cid, cell in zip(cols, r["c"])})
    return rows


def main():
    smoke = "--smoke" in sys.argv
    if "--parse-only" in sys.argv:  # reuse the latest captured xspace
        return _reduce_and_write(smoke)
    import jax
    import jax.numpy as jnp

    from animate3d_tpu.core.runtime import configure_persistent_cache
    configure_persistent_cache()

    if smoke:
        a = jnp.asarray(np.random.default_rng(0).normal(size=(2048, 2048)),
                        jnp.bfloat16)
        step = jax.jit(lambda a: (a @ a).sum())
        _capture(step, (a,), n=5)
    else:
        from bench import chain_bench  # noqa: F401  (env setup side effects)
        from animate3d_tpu.models.unet_mv import MVMotionUNet, MVUNetConfig

        cfg = MVUNetConfig()
        model = MVMotionUNet(cfg, dtype=jnp.bfloat16)
        bn, f, h, w = 8, 16, 32, 32
        rng = np.random.default_rng(0)
        latents = jnp.asarray(rng.normal(size=(bn, f, h, w, 4)), jnp.float32)
        t = jnp.asarray(501.0)
        text = jnp.asarray(rng.normal(size=(bn, 77, cfg.cross_attention_dim)),
                           jnp.float32)
        camera = jnp.asarray(rng.normal(size=(bn, 16)), jnp.float32)
        image_embeds = jnp.asarray(
            rng.normal(size=(bn, cfg.image_embed_dim)), jnp.float32)
        params = jax.jit(model.init)(jax.random.PRNGKey(0), latents[:4, :2],
                                     t, text[:4], camera[:4],
                                     image_embeds[:4])
        step = jax.jit(lambda p, x: model.apply(p, x, t, text, camera,
                                                image_embeds))
        _capture(step, (params, latents), n=2)

    return _reduce_and_write(smoke)


def _reduce_and_write(smoke):
    path = _find_xspace()
    if path is None:
        print("NO XSPACE captured — device tracing unavailable", flush=True)
        return 1
    print(f"xspace: {path} ({os.path.getsize(path)/1e6:.1f} MB)", flush=True)
    rows = _parse_xspace(path)
    n_steps = N_TRACE_STEPS
    dev = []
    for r in rows:
        if str(r.get("host_or_device", "")).lower() != "device":
            continue
        if r.get("total_self_time") is None:
            continue
        dev.append({
            "op": r.get("operation"),
            "type": r.get("type"),
            "self_us": float(r["total_self_time"]),
            "occurrences": r.get("occurrences"),
            "pct": round(float(r.get(
                "device_total_self_time_percent", 0.0)) * 100.0, 2),
            "flop_rate": r.get("measured_flop_rate"),
            "bound_by": r.get("bound_by"),
        })
    dev.sort(key=lambda d: -d["self_us"])
    by_type = {}
    for d in dev:
        by_type[d["type"]] = by_type.get(d["type"], 0.0) + d["self_us"]
    # module-level rollup: attribute each op to its outermost UNet submodule
    by_module = {}
    for d in dev:
        name = str(d["op"])
        mod = "other"
        if "MVMotionUNet/" in name:
            mod = name.split("MVMotionUNet/")[1].split("/")[0]
        by_module[mod] = by_module.get(mod, 0.0) + d["self_us"]
    out = {
        "n_trace_steps": n_steps,
        "total_device_us": round(sum(d["self_us"] for d in dev), 1),
        "per_step_ms": round(sum(d["self_us"] for d in dev) / n_steps / 1e3, 2),
        "by_type_us": {k: round(v, 1) for k, v in sorted(
            by_type.items(), key=lambda kv: -kv[1])},
        "by_module_us": {k: round(v, 1) for k, v in sorted(
            by_module.items(), key=lambda kv: -kv[1])[:40]},
        "top_ops": dev[:80],
    }
    dst = "docs/denoise_profile.json"
    if smoke:
        dst = "/tmp/denoise_profile_smoke.json"
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out["by_type_us"], indent=1))
    print(f"wrote {dst}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
