"""On-chip Mosaic-lowering + correctness validation of the round-3 kernel
additions, BEFORE any timing A/B (fast-wrong is possible; interpret mode
skips Mosaic legality checks — CLAUDE.md):

  1. bf16 scales in the production multi-K kernel (K-blocked static-index
     scale path), stacked + unstacked, all four 8B decode shapes;
  2. the decode-fused single-K kernel: norm prologue, rope epilogue,
     residual epilogue, at the exact 8B layer shapes.

Each case compares against the XLA dequant oracle fed the SAME stored
scales. Usage: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/check_fused_correctness.py
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np

from tinychatengine_tpu.ops.int4_matmul import (
    int4_matmul,
    int4_matmul_fused,
    int4_matmul_xla,
)
from tinychatengine_tpu.ops.ref import rms_norm_ref

G = 128
SHAPES = [(4096, 6144), (4096, 4096), (4096, 28672), (14336, 4096)]
oracle = jax.jit(int4_matmul_xla, static_argnums=3)


def relerr(got, want):
    got, want = np.asarray(got, np.float32), np.asarray(want, np.float32)
    return float(np.max(np.abs(got - want) / np.maximum(np.abs(want), 1e-3)))


def report(name, err, tol=3e-2):
    ok = "OK " if err < tol else "WRONG"
    print(f"  {name:28s} rel_err={err:.2e}  {ok}", flush=True)
    return err < tol


def main():
    assert jax.devices()[0].platform == "tpu", jax.devices()
    failures = 0
    L = 2
    for k, n in SHAPES:
        key = jax.random.PRNGKey(k + n)
        kp, ks_, kx, kn, kr, kc = jax.random.split(key, 6)
        packed = jax.random.randint(kp, (L, k // 2, n), 0, 255,
                                    jnp.int32).astype(jnp.uint8)
        scales32 = jax.random.uniform(ks_, (L, k // G, n), jnp.float32) \
            * 0.01 + 0.001
        scales16 = scales32.astype(jnp.bfloat16)
        s16_as32 = scales16.astype(jnp.float32)  # oracle uses STORED values
        x = jax.random.normal(kx, (1, k), jnp.bfloat16)
        nw = (jax.random.normal(kn, (L, k), jnp.bfloat16) * 0.1
              + 1.0).astype(jnp.bfloat16)
        res = jax.random.normal(kr, (1, n), jnp.bfloat16)
        print(f"shape ({k}->{n}):", flush=True)

        for li in (0, 1):
            want = oracle(x, packed[li], s16_as32[li], G)
            # 1a. bf16 scales, stacked multi-K kernel
            got = int4_matmul(x, packed, scales16, G,
                              layer_idx=jnp.int32(li))
            failures += not report(f"bf16 scales stacked L={li}",
                                   relerr(got, want))
        # 1b. bf16 scales, unstacked
        want = oracle(x, packed[0], s16_as32[0], G)
        got = int4_matmul(x, packed[0], scales16[0], G)
        failures += not report("bf16 scales unstacked", relerr(got, want))

        # 2a. fused norm prologue
        want = oracle(rms_norm_ref(x, nw[1], 1e-5), packed[1],
                      s16_as32[1], G)
        got = int4_matmul_fused(x, packed, scales16, G,
                                layer_idx=jnp.int32(1), norm_w=nw,
                                norm_eps=1e-5)
        failures += not report("fused norm", relerr(got, want))

        # 2a'. fused LayerNorm prologue + linear-bias epilogue (the
        # OPT/GPTBigCode decode shape of the same kernel)
        from tinychatengine_tpu.ops.ref import layer_norm_ref
        nb = jax.random.normal(kn, (L, k), jnp.bfloat16) * 0.1
        bvec = jax.random.normal(kr, (L, n), jnp.float32) * 0.3
        base = oracle(layer_norm_ref(x, nw[0], nb[0], 1e-5), packed[0],
                      s16_as32[0], G).astype(jnp.bfloat16)
        want = (base.astype(jnp.float32)
                + bvec[0].astype(jnp.bfloat16).astype(jnp.float32)
                ).astype(jnp.bfloat16)
        got = int4_matmul_fused(x, packed, scales16, G,
                                layer_idx=jnp.int32(0), norm_w=nw,
                                norm_b=nb, norm_eps=1e-5, bias=bvec)
        failures += not report("fused layernorm+bias", relerr(got, want))

        # 2b. fused residual epilogue
        want = (oracle(x, packed[0], s16_as32[0], G).astype(jnp.bfloat16)
                .astype(jnp.float32) + res.astype(jnp.float32)
                ).astype(jnp.bfloat16)
        got = int4_matmul_fused(x, packed, scales16, G,
                                layer_idx=jnp.int32(0), residual=res)
        failures += not report("fused residual", relerr(got, want))

        # 2c. fused norm + rope epilogue (qkv shape only; d=128)
        if (k, n) == (4096, 6144):
            d, qk_cols = 128, 5120  # 32 q heads + 8 k heads
            ang = jax.random.uniform(kc, (1, d), jnp.float32) * 6.28
            cos, sin = jnp.cos(ang), jnp.sin(ang)
            base = oracle(rms_norm_ref(x, nw[0], 1e-5), packed[0],
                          s16_as32[0], G).astype(jnp.bfloat16)
            bf = np.asarray(base, np.float32)
            half = d // 2
            want = bf.copy()
            for h in range(qk_cols // d):
                blk = bf[:, h * d:(h + 1) * d]
                rot = np.concatenate([-blk[:, half:], blk[:, :half]], axis=1)
                want[:, h * d:(h + 1) * d] = (blk * np.asarray(cos)
                                              + rot * np.asarray(sin))
            want = want.astype(jnp.bfloat16)
            got = int4_matmul_fused(x, packed, scales16, G,
                                    layer_idx=jnp.int32(0), norm_w=nw,
                                    norm_eps=1e-5, rope_cos=cos,
                                    rope_sin=sin, rope_qk_cols=qk_cols,
                                    head_dim=d)
            failures += not report("fused norm+rope", relerr(got, want))

    # 3. ctx_cap flash decode (engine.py passes this UNGATED; the 128-row
    #    KV-block mode is a block shape the chip has never lowered —
    #    validate here before any bench relies on it; kill-switch
    #    TCE_NO_CTXCAP if wrong)
    from tinychatengine_tpu.ops.attention import attention_xla, flash_decode

    def gerr(got, want):  # attention outputs cross zero — normalize globally
        got = np.asarray(got, np.float32)
        want = np.asarray(want, np.float32)
        return float(np.max(np.abs(got - want)) / np.max(np.abs(want)))

    Lc, B, HKV, SMAX, D = 2, 1, 8, 2048, 128
    HQ = 32
    key = jax.random.PRNGKey(7)
    kq, kk, kv = jax.random.split(key, 3)
    ck = jax.random.normal(kk, (Lc, B, HKV, SMAX, D), jnp.bfloat16)
    cv = jax.random.normal(kv, (Lc, B, HKV, SMAX, D), jnp.bfloat16)
    qd = jax.random.normal(kq, (B, HQ, D), jnp.bfloat16)
    for length, cap, tag in ((96, 512, "ctx_cap 128-blk"),
                             (800, 1024, "ctx_cap grid-trim"),
                             (96, None, "ctx_cap off")):
        want = attention_xla(
            qd[:, None], ck[1], cv[1],
            jnp.full((B, 1), length - 1, jnp.int32), length
        ).reshape(B, HQ, D)
        got = flash_decode(qd, ck, cv, jnp.int32(1),
                           jnp.full((B,), length, jnp.int32), ctx_cap=cap)
        failures += not report(tag, gerr(got, want), tol=5e-2)
    # int8 KV variant through the same capped path
    ck8 = jnp.clip(jnp.round(ck.astype(jnp.float32) * 32), -127, 127
                   ).astype(jnp.int8)
    cv8 = jnp.clip(jnp.round(cv.astype(jnp.float32) * 32), -127, 127
                   ).astype(jnp.int8)
    ks = jnp.full((Lc, B, HKV, SMAX), 1 / 32, jnp.float32)
    want = attention_xla(
        qd[:, None], ck8[1].astype(jnp.float32).astype(jnp.bfloat16) / 32,
        cv8[1].astype(jnp.float32).astype(jnp.bfloat16) / 32,
        jnp.full((B, 1), 95, jnp.int32), 96).reshape(B, HQ, D)
    got = flash_decode(qd, ck8, cv8, jnp.int32(1),
                       jnp.full((B,), 96, jnp.int32), ks, ks, ctx_cap=512)
    failures += not report("ctx_cap int8 KV", gerr(got, want), tol=5e-2)

    # 4. int8_decode — the OPT W8A8 2-pass attention kernel (VERDICT r3 #4:
    #    oracle-tested in interpret mode + AOT-lowered but never RUN on
    #    silicon; interpret-clean kernels have miscompiled before, PERF.md
    #    negative #5). All phases: odd lengths, block boundaries, full
    #    cache, both layers of the stack.
    from tinychatengine_tpu.ops.attention import int8_decode

    rng = np.random.default_rng(3)
    Li, Bi, Hi, Si, Di = 2, 2, 8, 1024, 128
    ck_s8 = jnp.asarray(rng.integers(-127, 128, (Li, Bi, Hi, Si, Di)),
                        jnp.int8)
    cv_s8 = jnp.asarray(rng.integers(-127, 128, (Li, Bi, Hi, Si, Di)),
                        jnp.int8)
    q_s8 = jnp.asarray(rng.integers(-127, 128, (Bi, Hi, Di)), jnp.int8)
    qk_alpha, pv_alpha = 1.7e-4, 2.3e-3

    def int8_oracle(li, lengths):
        outs = []
        for b in range(Bi):
            nv = int(lengths[b])
            kk = np.asarray(ck_s8[li, b, :, :nv], np.float32)
            vv = np.asarray(cv_s8[li, b, :, :nv], np.float32)
            qq = np.asarray(q_s8, np.float32)[b]
            sc = np.einsum("hd,hnd->hn", qq, kk) * qk_alpha
            p = np.exp(sc - sc.max(-1, keepdims=True))
            p = p / p.sum(-1, keepdims=True)
            p127 = np.clip(np.round(p * 127.0), -128, 127)
            outs.append(np.einsum("hn,hnd->hd", p127, vv) * pv_alpha)
        return np.stack(outs)

    for li, lengths, tag in ((0, [37, 512], "int8_decode odd+block-edge"),
                             (1, [1, 1024], "int8_decode min+full"),
                             (1, [511, 513], "int8_decode straddle")):
        la = np.asarray(lengths, np.int32)
        got = int8_decode(q_s8, ck_s8, cv_s8, jnp.int32(li),
                          jnp.asarray(la), qk_alpha, pv_alpha)
        failures += not report(tag, gerr(got, int8_oracle(li, la)), tol=5e-3)

    print(f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
