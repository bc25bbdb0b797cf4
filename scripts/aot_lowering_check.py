"""Deviceless Mosaic-lowering screen for the staged decode levers.

The local libtpu can AOT-compile for a v5e topology WITHOUT hardware
(jax.experimental.topologies compile-only devices). That runs the real
Mosaic kernel compiler, so BlockSpec/layout legality errors (the class of
failure interpret=True silently skips — CLAUDE.md) surface locally even
while the TPU tunnel is down.

LIMITS: this proves the kernels LOWER, not that they compute the right
numbers on silicon (the zero-point-dot episode was a silent miscompile
that lowered fine — PERF.md negative result #5). On-chip
scripts/check_fused_correctness.py remains mandatory before flipping
defaults. Version skew between the local libtpu and the tunnel's is
possible but both are v5e toolchains.

Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/aot_lowering_check.py
"""

import functools
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_platforms", "cpu")

from jax.experimental import topologies  # noqa: E402
from jax.sharding import SingleDeviceSharding  # noqa: E402

from tinychatengine_tpu.ops import int4_matmul as int4m  # noqa: E402
from tinychatengine_tpu.ops.attention import flash_decode  # noqa: E402
from tinychatengine_tpu.ops.int4_matmul import (  # noqa: E402
    int4_matmul,
    int4_matmul_fused,
)

G = 128
SHAPES = [(4096, 6144), (4096, 4096), (4096, 28672), (14336, 4096)]


def main():
    topo = topologies.get_topology_desc("v5e:2x2", "tpu")
    sh = SingleDeviceSharding(topo.devices[0])

    def S(shape, dtype):
        return jax.ShapeDtypeStruct(shape, dtype, sharding=sh)

    def S2(t, sharding):
        return jax.ShapeDtypeStruct(t.shape, t.dtype, sharding=sharding)

    failures = 0

    def check(name, fn, *args, static=(), **kwargs):
        nonlocal failures
        t0 = time.perf_counter()
        try:
            jax.jit(fn, static_argnames=static).lower(*args, **kwargs).compile()
            print(f"  {name:42s} LOWERS  ({time.perf_counter() - t0:.1f}s)",
                  flush=True)
        except Exception as e:
            failures += 1
            msg = str(e).splitlines()[0][:150]
            print(f"  {name:42s} FAILS   {type(e).__name__}: {msg}",
                  flush=True)

    L = 2
    li = S((), jnp.int32)
    for k, n in SHAPES:
        print(f"shape ({k}->{n}):", flush=True)
        x = S((1, k), jnp.bfloat16)
        packed = S((L, k // 2, n), jnp.uint8)
        for sd, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            scales = S((L, k // G, n), sd)
            check(f"int4_matmul stacked {tag} scales",
                  functools.partial(int4_matmul, group_size=G),
                  x, packed, scales, layer_idx=li)
            check(f"fused norm+residual {tag} scales",
                  functools.partial(int4_matmul_fused, group_size=G,
                                    norm_eps=1e-5),
                  x, packed, scales, layer_idx=li,
                  norm_w=S((L, k), jnp.bfloat16),
                  residual=S((1, n), jnp.bfloat16))
        scales = S((L, k // G, n), jnp.float32)
        check("fused layernorm+bias",
              functools.partial(int4_matmul_fused, group_size=G,
                                norm_eps=1e-5),
              x, packed, scales, layer_idx=li,
              norm_w=S((L, k), jnp.bfloat16), norm_b=S((L, k), jnp.bfloat16),
              bias=S((L, n), jnp.float32))
        if (k, n) == (4096, 6144):
            check("fused norm+rope",
                  functools.partial(int4_matmul_fused, group_size=G,
                                    norm_eps=1e-5, rope_qk_cols=5120,
                                    head_dim=128),
                  x, packed, scales, layer_idx=li,
                  norm_w=S((L, k), jnp.bfloat16),
                  rope_cos=S((1, 128), jnp.float32),
                  rope_sin=S((1, 128), jnp.float32))

    # pack-time-padded K (llama-2-family hidden dims: scale rows % 8 != 0
    # fail Mosaic without the pad — the r4 bench_vlm regression; padded_ic)
    print("padded-K shapes (llama-2/VILA down-proj):", flush=True)
    from tinychatengine_tpu.ops.int4_matmul import int4_matmul_a8
    for k_x, n in ((11008, 4096), (13824, 5120)):
        from tinychatengine_tpu.quant.packing import padded_ic
        k_w = padded_ic(k_x, G)
        assert k_w != k_x, (k_x, "expected a padded shape")
        xp = S((1, k_x), jnp.bfloat16)
        packed = S((L, k_w // 2, n), jnp.uint8)
        for sd, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
            scales = S((L, k_w // G, n), sd)
            check(f"int4_matmul K={k_x}->pad{k_w} {tag} scales",
                  functools.partial(int4_matmul, group_size=G),
                  xp, packed, scales, layer_idx=li)
        scales = S((L, k_w // G, n), jnp.float32)
        check(f"int4_matmul_a8 K={k_x}->pad{k_w}",
              functools.partial(int4_matmul_a8, group_size=G),
              xp, packed, scales, layer_idx=li)

    # ctx_cap flash decode block modes (always-on in the engine loop)
    print("flash_decode ctx_cap:", flush=True)
    Lc, B, HKV, SMAX, D, HQ = 2, 1, 8, 2048, 128, 32
    q = S((B, HQ, D), jnp.bfloat16)
    lens = S((B,), jnp.int32)
    for cap, tag in ((512, "128-blk"), (1024, "grid-trim"), (None, "off")):
        ck = S((Lc, B, HKV, SMAX, D), jnp.bfloat16)
        check(f"flash_decode bf16 KV ctx_cap={tag}",
              functools.partial(flash_decode, ctx_cap=cap),
              q, ck, ck, li, lens)
    ck8 = S((Lc, B, HKV, SMAX, D), jnp.int8)
    ks = S((Lc, B, HKV, SMAX), jnp.float32)
    check("flash_decode int8 KV ctx_cap=128-blk",
          functools.partial(flash_decode, ctx_cap=512),
          q, ck8, ck8, li, lens, ks, ks)

    # int8-KV chunked prefill at a long-context shape (the r4 bench_longctx
    # --kv int8 regression: the one-head (1, block_s) scale block was
    # Mosaic-illegal; now full-H blocks + in-kernel one-hot head select)
    from tinychatengine_tpu.ops.attention import flash_prefill
    SLONG = 16384
    qp = S((B, 2048, HQ, D), jnp.bfloat16)
    ck8l = S((Lc, B, HKV, SLONG, D), jnp.int8)
    ksl = S((Lc, B, HKV, SLONG), jnp.float32)
    check("flash_prefill int8 KV S=16384", flash_prefill,
          qp, ck8l, ck8l, li, S((), jnp.int32), S((), jnp.int32), ksl, ksl)
    ckbl = S((Lc, B, HKV, SLONG, D), jnp.bfloat16)
    check("flash_prefill bf16 KV S=16384", flash_prefill,
          qp, ckbl, ckbl, li, S((), jnp.int32), S((), jnp.int32))

    # the whole fused decode step at the bench model size (the program
    # bench.py will run with TCE_DECODE_FUSED=1)
    print("full decode step (llama3_8b, fused):", flush=True)
    from tinychatengine_tpu.core.config import QuantConfig, get_model_config
    from tinychatengine_tpu.generation import kv_cache as kvc
    from tinychatengine_tpu.models import llama

    cfg = get_model_config("llama3_8b")
    qcfg = QuantConfig(scheme="w4a16")
    params = jax.eval_shape(
        lambda: llama.init_random_params(cfg, qcfg, seed=0, max_pos=2048,
                                         fast=True))
    params = jax.tree.map(lambda t: S(t.shape, t.dtype), params)
    cache = jax.eval_shape(lambda: kvc.init_cache(
        cfg.num_layers, 1, 2048, cfg.num_kv_heads, cfg.head_dim))
    cache = jax.tree.map(lambda t: S(t.shape, t.dtype), cache)
    # the model's path selection reads jax.default_backend() (CPU here, so
    # it would pick interpret-mode pallas = no Mosaic). Patch the MODULE
    # attribute the model calls — JAX internals import their own reference
    # and are unaffected; lowering itself targets the v5e topology devices.
    saved = int4m.FUSED_DECODE
    saved_backend = jax.default_backend
    int4m.FUSED_DECODE = True
    jax.default_backend = lambda: "tpu"
    try:
        check("llama3_8b fused decode step (s=1)",
              functools.partial(llama.forward, cfg=cfg),
              params, input_ids=S((1, 1), jnp.int32), cache=cache,
              start=S((), jnp.int32), ctx_cap=512, static=("ctx_cap",))
        int4m.FUSED_DECODE = False
        check("llama3_8b UNFUSED decode step (s=1)",
              functools.partial(llama.forward, cfg=cfg),
              params, input_ids=S((1, 1), jnp.int32), cache=cache,
              start=S((), jnp.int32), ctx_cap=512, static=("ctx_cap",))
    finally:
        int4m.FUSED_DECODE = saved
        jax.default_backend = saved_backend

    # the tensor-parallel serving step against REAL v5e compile-only devices
    # (dryrun_multichip only exercises a virtual CPU mesh — this runs the
    # sharded program incl. the Pallas kernels at per-shard shapes through
    # the actual TPU compiler + Mosaic)
    print("TP x DP step (4-way model parallel, v5e topology):", flush=True)
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P

    from tinychatengine_tpu.core.config import ModelConfig
    from tinychatengine_tpu.parallel.sharding import (
        cache_spec,
        llama_param_specs,
        make_mesh,
    )
    from tinychatengine_tpu.parallel.tp import make_tp_forward

    tcfg = ModelConfig(
        name="aot_tp", family="llama", num_heads=8, num_kv_heads=4,
        num_layers=2, max_sqlen=32, embed_dim=1024, hidden_dim=1024,
        vocab_size=512, rms_norm_eps=1e-5)
    mesh = make_mesh(n_data=1, n_model=4, devices=list(topo.devices))
    # tiny config: build real (CPU) params just for shapes/dtypes
    p_shapes = llama.init_random_params(tcfg, qcfg, seed=0, tp_degree=4)
    specs = llama_param_specs(p_shapes)
    tp_params = jax.tree.map(
        lambda t, spec: None if t is None else jax.ShapeDtypeStruct(
            t.shape, t.dtype, sharding=NamedSharding(mesh, spec)),
        p_shapes, specs, is_leaf=lambda x: x is None)
    c_shapes = kvc.init_cache(
        tcfg.num_layers, 1, tcfg.max_sqlen, tcfg.num_kv_heads, tcfg.head_dim)
    tp_cache = kvc.KVCache(
        k=S2(c_shapes.k, NamedSharding(mesh, cache_spec())),
        v=S2(c_shapes.v, NamedSharding(mesh, cache_spec())),
        length=S2(c_shapes.length, NamedSharding(mesh, P())))
    tp_forward = make_tp_forward(mesh)
    rep = NamedSharding(mesh, P())
    dat = NamedSharding(mesh, P("data", None))
    jax.default_backend = lambda: "tpu"
    try:
        check("tp serving step (prefill s=8)",
              functools.partial(tp_forward, cfg=tcfg),
              tp_params,
              input_ids=jax.ShapeDtypeStruct((1, 8), jnp.int32, sharding=dat),
              cache=tp_cache,
              start=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep))
        check("tp serving step (decode s=1)",
              functools.partial(tp_forward, cfg=tcfg),
              tp_params,
              input_ids=jax.ShapeDtypeStruct((1, 1), jnp.int32, sharding=dat),
              cache=tp_cache,
              start=jax.ShapeDtypeStruct((), jnp.int32, sharding=rep))
    finally:
        jax.default_backend = saved_backend

    # sequence-parallel ring prefill (SP x TP) and pipeline-parallel forward
    # against the same real v5e topology: pure-XLA collectives (ppermute in
    # lax.scan, owner psums) — no Mosaic risk, but sharded-program lowering
    # bugs (layout/reshard choices) only show up in the TPU compiler
    print("SP x TP ring prefill (2 seq x 2 model, v5e topology):", flush=True)
    from tinychatengine_tpu.parallel.sp import (
        _sp_cache_specs,
        make_sp_mesh,
        make_sp_prefill,
    )

    sp_mesh = make_sp_mesh(2, 2, devices=list(topo.devices))
    sp_shapes = llama.init_random_params(tcfg, qcfg, seed=0, tp_degree=2)
    sp_params = jax.tree.map(
        lambda t, spec: None if t is None else jax.ShapeDtypeStruct(
            t.shape, t.dtype, sharding=NamedSharding(sp_mesh, spec)),
        sp_shapes, llama_param_specs(sp_shapes), is_leaf=lambda x: x is None)
    spc = kvc.init_cache(tcfg.num_layers, 1, 16, tcfg.num_kv_heads,
                         tcfg.head_dim)
    sp_cache = jax.tree.map(
        lambda t, spec: None if t is None else jax.ShapeDtypeStruct(
            t.shape, t.dtype, sharding=NamedSharding(sp_mesh, spec)),
        spc, _sp_cache_specs(spc), is_leaf=lambda x: x is None)
    jax.default_backend = lambda: "tpu"
    try:
        check("sp x tp ring prefill (s=16)",
              functools.partial(make_sp_prefill(sp_mesh), cfg=tcfg),
              sp_params,
              input_ids=jax.ShapeDtypeStruct(
                  (1, 16), jnp.int32,
                  sharding=NamedSharding(sp_mesh, P(None, "seq"))),
              cache=sp_cache)
    finally:
        jax.default_backend = saved_backend

    # 32k-token ring prefill (VERDICT r3 #3): the flash-blocked hop keeps
    # per-hop score memory O(block_q x block_k); this proves the long-context
    # SP program compiles for real v5e devices at the 32768 length the
    # reference exports rotary caches for but never runs
    # (/root/reference/llm/tools/model_quantizer.py:313-319)
    print("SP ring prefill 32k (4-way seq, v5e topology):", flush=True)
    lcfg = ModelConfig(
        name="aot_sp32k", family="llama", num_heads=8, num_kv_heads=4,
        num_layers=2, max_sqlen=32768, embed_dim=1024, hidden_dim=1024,
        vocab_size=512, rms_norm_eps=1e-5)
    sp32_mesh = make_sp_mesh(4, 1, devices=list(topo.devices))
    sp32_shapes = llama.init_random_params(lcfg, qcfg, seed=0,
                                           max_pos=32768, fast=True)
    sp32_params = jax.tree.map(
        lambda t, spec: None if t is None else jax.ShapeDtypeStruct(
            t.shape, t.dtype, sharding=NamedSharding(sp32_mesh, spec)),
        sp32_shapes, llama_param_specs(sp32_shapes),
        is_leaf=lambda x: x is None)
    spc32 = jax.eval_shape(lambda: kvc.init_cache(
        lcfg.num_layers, 1, 32768, lcfg.num_kv_heads, lcfg.head_dim))
    sp32_cache = jax.tree.map(
        lambda t, spec: None if t is None else jax.ShapeDtypeStruct(
            t.shape, t.dtype, sharding=NamedSharding(sp32_mesh, spec)),
        spc32, _sp_cache_specs(spc32), is_leaf=lambda x: x is None)
    jax.default_backend = lambda: "tpu"
    try:
        check("sp ring prefill (s=32768, 4-way)",
              functools.partial(make_sp_prefill(sp32_mesh), cfg=lcfg),
              sp32_params,
              input_ids=jax.ShapeDtypeStruct(
                  (1, 32768), jnp.int32,
                  sharding=NamedSharding(sp32_mesh, P(None, "seq"))),
              cache=sp32_cache)
    finally:
        jax.default_backend = saved_backend

    print("PP x TP forward (2 pipe x 2 model, v5e topology):", flush=True)
    from tinychatengine_tpu.parallel.pp import (
        _pp_cache_specs,
        llama_pp_param_specs,
        make_pp_forward,
        make_pp_mesh,
    )

    pp_mesh = make_pp_mesh(2, 2, devices=list(topo.devices))
    pp_shapes = llama.init_random_params(tcfg, qcfg, seed=0, tp_degree=2)
    pp_params = jax.tree.map(
        lambda t, spec: None if t is None else jax.ShapeDtypeStruct(
            t.shape, t.dtype, sharding=NamedSharding(pp_mesh, spec)),
        pp_shapes, llama_pp_param_specs(pp_shapes, tp=True),
        is_leaf=lambda x: x is None)
    ppc = kvc.init_cache(tcfg.num_layers, 2, tcfg.max_sqlen,
                         tcfg.num_kv_heads, tcfg.head_dim)
    pp_cache = jax.tree.map(
        lambda t, spec: None if t is None else jax.ShapeDtypeStruct(
            t.shape, t.dtype, sharding=NamedSharding(pp_mesh, spec)),
        ppc, _pp_cache_specs(ppc, tp=True), is_leaf=lambda x: x is None)
    pp_rep = NamedSharding(pp_mesh, P())
    jax.default_backend = lambda: "tpu"
    try:
        check("pp x tp forward (prefill s=8, 2 microbatches)",
              functools.partial(make_pp_forward(pp_mesh, 2), cfg=tcfg),
              pp_params,
              input_ids=jax.ShapeDtypeStruct(
                  (2, 8), jnp.int32, sharding=NamedSharding(
                      pp_mesh, P(None, None))),
              cache=pp_cache,
              start=jax.ShapeDtypeStruct((), jnp.int32, sharding=pp_rep))
    finally:
        jax.default_backend = saved_backend

    print("ALL LOWER" if failures == 0 else f"{failures} LOWERING FAILURES")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
