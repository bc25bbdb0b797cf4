"""SP-admission and PP-decode serving (VERDICT r3 #5): long prompts
admitted through the sequence-parallel ring prefill (decode unchanged),
and a ServingEngine decoding THROUGH the pipeline-parallel forward with
microbatch slot grouping — outputs must equal the plain engine exactly
(greedy) on the 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tinychatengine_tpu.core.config import (GenerationConfig, ModelConfig,
                                            QuantConfig)
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.parallel.sp import make_sp_mesh
from tinychatengine_tpu.runtime.serving import ServingEngine


def _tiny(scheme="fp"):
    cfg = ModelConfig(
        name="tiny", family="llama", num_heads=8, num_kv_heads=4,
        num_layers=2, max_sqlen=256, embed_dim=1024, hidden_dim=1024,
        vocab_size=512, rms_norm_eps=1e-5)
    qcfg = QuantConfig(scheme=scheme)
    params = llama.init_random_params(cfg, qcfg, seed=0)
    return cfg, qcfg, params


def _prompts(cfg, rng):
    # two long prompts (SP-eligible at threshold 32), two short ones
    return [
        rng.integers(1, cfg.vocab_size, 100).astype(np.int32),
        rng.integers(1, cfg.vocab_size, 7).astype(np.int32),
        rng.integers(1, cfg.vocab_size, 65).astype(np.int32),
        rng.integers(1, cfg.vocab_size, 3).astype(np.int32),
    ]


@pytest.mark.slow
def test_sp_admission_matches_plain_greedy():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    prompts = _prompts(cfg, np.random.default_rng(0))

    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want = [list(eng.generate(p[None, :], g).tokens[0]) for p in prompts]

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g,
                        sp_mesh=make_sp_mesh(4), sp_threshold=32)
    reqs = [srv.submit(p, n_predict=8) for p in prompts]
    srv.run()
    assert all(r.finished for r in reqs)
    for r, w in zip(reqs, want):
        assert r.output_ids == w, (r.request_id, r.output_ids, w)
    # prompts 0 and 2 cross the threshold: 64-token heads ring-prefilled
    assert srv.sp_stats == {"admissions": 2, "tokens": 128}, srv.sp_stats


@pytest.mark.slow
def test_sp_admission_paged_and_quant_int8kv():
    """SP admission must compose with the paged cache and int8 KV — the
    ring writes a bf16 prefill cache in the same storage as scratch."""
    cfg, _, _ = _tiny()
    qcfg = QuantConfig(scheme="fp", kv_cache_dtype="int8")
    params = llama.init_random_params(cfg, qcfg, seed=0)
    g = GenerationConfig(temp=0.0, n_predict=6, repeat_penalty=1.0,
                         repeat_last_n=1)
    prompts = _prompts(cfg, np.random.default_rng(1))

    plain = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g)
    want = [plain.submit(p, n_predict=6) for p in prompts]
    plain.run()

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                        page_size=16, sp_mesh=make_sp_mesh(4),
                        sp_threshold=32)
    reqs = [srv.submit(p, n_predict=6) for p in prompts]
    srv.run()
    for r, w in zip(reqs, want):
        assert r.output_ids == w.output_ids, (r.request_id,)
    assert srv.sp_stats["admissions"] == 2


def test_sp_admission_with_tp_decode_golden():
    """SP prefill -> TP decode on REAL trained weights: the committed golden
    greedy transcript must reproduce token-exactly when the request flows
    through the ring on a (2 seq x 2 model) mesh at admission and through
    Megatron TP on a (1 data x 2 model) mesh per decode tick (VERDICT r3 #5
    'a request flows through SP prefill -> TP decode under test').

    Random tiny-weight models are knife-edge under greedy (near-uniform
    logits flip on bf16 re-association between the ring and the dense
    oracle), so this test uses the repo's real-weights anchor, like
    test_accuracy.py::test_golden_transcript_through_sp_and_pp."""
    import json
    from pathlib import Path

    import pytest

    from tinychatengine_tpu.core.config import get_model_config
    from tinychatengine_tpu.parallel.sharding import make_mesh, shard_params
    from tinychatengine_tpu.parallel.tp import make_tp_forward
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
    from tinychatengine_tpu.tools.checkpoint import load_checkpoint

    repo = Path(__file__).resolve().parent.parent
    ckpt = repo / "assets" / "bytellama_5m"
    golden = Path(__file__).parent / "golden" / "bytellama_greedy.json"
    if not (ckpt / "meta.json").exists() or not golden.exists():
        pytest.skip("trained checkpoint / golden transcript not present")

    from tinychatengine_tpu.tools.convert import refuse_llama_tp

    cfg = get_model_config("bytellama_5m")
    params1, qcfg = load_checkpoint(str(ckpt), cfg)
    # fused layouts are tp-degree-specific: re-interleave for 2 shards
    params = refuse_llama_tp(params1, cfg, tp_degree=2)
    gold = json.loads(golden.read_text())
    ids = np.asarray(ByteTokenizer().encode(gold["prompt"]), np.int32)
    n_check = 16
    g = GenerationConfig(temp=0.0, n_predict=n_check, repeat_penalty=1.0,
                         repeat_last_n=1)

    # decode TP mesh (1 data x 2 model, 2 devices) and SP ring mesh
    # (2 seq x 2 model, 4 devices) are DIFFERENT device sets: each dispatch
    # needs params resident on its own mesh (sp_params), and the engine
    # device_puts the filled prefill KV back to the decode side
    tp_mesh = make_mesh(n_data=1, n_model=2)
    sp_mesh = make_sp_mesh(2, 2)
    srv = ServingEngine(shard_params(params, tp_mesh), cfg, qcfg, slots=2,
                        gcfg=g, forward_fn=make_tp_forward(tp_mesh),
                        sp_mesh=sp_mesh, sp_threshold=16,
                        sp_params=shard_params(params, sp_mesh))
    req = srv.submit(ids, n_predict=n_check)
    srv.run()
    assert req.finished
    assert req.output_ids == gold["token_ids"][:n_check], req.output_ids
    # the 32-token head of the 33-token (BOS + 32 bytes) prompt rode the ring
    assert srv.sp_stats == {"admissions": 1, "tokens": 32}, srv.sp_stats


@pytest.mark.slow
def test_pp_serving_decode_golden():
    """ServingEngine decoding THROUGH the pipeline-parallel forward
    (VERDICT r3 #5 stretch: PP decode with microbatch>1 slot grouping so
    GPipe bubbles amortize): 2 slots ride a (2 pipe)-stage mesh as 2
    microbatches per ragged decode tick, admission prefill flows through
    the same PP forward (one microbatch, true_len-bucketed), and the real-
    weights golden transcript must reproduce token-exactly — alongside a
    second concurrent request (so ragged per-row starts are exercised)."""
    import json
    from pathlib import Path

    import pytest

    from tinychatengine_tpu.core.config import get_model_config
    from tinychatengine_tpu.parallel.pp import make_pp_forward, make_pp_mesh, shard_pp
    from tinychatengine_tpu.generation import kv_cache as kvc
    from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
    from tinychatengine_tpu.tools.checkpoint import load_checkpoint

    repo = Path(__file__).resolve().parent.parent
    ckpt = repo / "assets" / "bytellama_5m"
    golden = Path(__file__).parent / "golden" / "bytellama_greedy.json"
    if not (ckpt / "meta.json").exists() or not golden.exists():
        pytest.skip("trained checkpoint / golden transcript not present")

    cfg = get_model_config("bytellama_5m")
    params, qcfg = load_checkpoint(str(ckpt), cfg)
    gold = json.loads(golden.read_text())
    tok = ByteTokenizer()
    ids = np.asarray(tok.encode(gold["prompt"]), np.int32)
    n_check = 16
    g = GenerationConfig(temp=0.0, n_predict=n_check, repeat_penalty=1.0,
                         repeat_last_n=1)

    mesh = make_pp_mesh(2)
    max_len = 256
    pp_params, pp_cache = shard_pp(
        params, kvc.init_cache(cfg.num_layers, 2, max_len, cfg.num_kv_heads,
                               cfg.head_dim), mesh)
    srv = ServingEngine(pp_params, cfg, qcfg, slots=2, max_len=max_len,
                        gcfg=g, forward_fn=make_pp_forward(mesh, n_micro=2))
    srv.cache = pp_cache  # pipe-sharded slot cache

    other = np.asarray(tok.encode("def main():"), np.int32)
    req = srv.submit(ids, n_predict=n_check)
    req2 = srv.submit(other, n_predict=8)
    srv.run()
    assert req.finished and req2.finished
    assert req.output_ids == gold["token_ids"][:n_check], req.output_ids

    # the second slot's chain must equal its solo single-device run
    eng = Engine(params, cfg, qcfg, batch=1, max_len=max_len)
    want2 = list(eng.generate(other[None, :], g).tokens[0])[:8]
    assert req2.output_ids == want2, (req2.output_ids, want2)
