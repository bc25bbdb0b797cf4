"""Continuous-batching serving runtime.

The key invariant: a request decoded in a shared ragged batch produces
EXACTLY the tokens it would produce alone (greedy) — slots, ragged lengths,
admission order and dead rows must not leak across sequences.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from tinychatengine_tpu.core.config import GenerationConfig, ModelConfig, QuantConfig
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.runtime.serving import ServingEngine


def _tiny():
    cfg = ModelConfig(
        name="tiny", family="llama", num_heads=4, num_kv_heads=2,
        num_layers=2, max_sqlen=128, embed_dim=128, hidden_dim=256,
        vocab_size=256, rms_norm_eps=1e-5)
    qcfg = QuantConfig(scheme="fp")
    params = llama.init_random_params(cfg, qcfg, seed=0)
    return cfg, qcfg, params


PROMPTS = [
    np.array([5, 9, 11], np.int32),
    np.array([7, 3], np.int32),
    np.array([100, 101, 102, 103, 104, 105], np.int32),
    np.array([42], np.int32),
    np.array([1, 2, 3, 4], np.int32),
]


def test_batched_greedy_matches_single():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=12, repeat_penalty=1.0,
                         repeat_last_n=1)

    # oracle: one at a time through the single-request engine
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want = [eng.generate(p[None, :], g).tokens[0] for p in PROMPTS]

    # serving engine with fewer slots than requests → queueing + backfill
    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g)
    reqs = [srv.submit(p, n_predict=12) for p in PROMPTS]
    srv.run()
    assert all(r.finished for r in reqs)
    for r, w in zip(reqs, want):
        assert r.output_ids == list(w), (r.request_id, r.output_ids, w)
        assert r.finish_reason == "length"


@pytest.mark.slow
def test_chunked_admission_interleaves_with_decode():
    """A long-prompt admission must NOT stall the running batch: while it
    prefills (one chunk per tick), active slots keep emitting one token per
    tick — and everybody's greedy output still matches a solo run
    (VERDICT r1 item 10)."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=30, repeat_penalty=1.0,
                         repeat_last_n=1)
    long_prompt = np.arange(10, 74, dtype=np.int32)  # 64 tokens

    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want_a = eng.generate(PROMPTS[0][None, :], g).tokens[0]
    want_b = eng.generate(long_prompt[None, :], GenerationConfig(
        temp=0.0, n_predict=8, repeat_penalty=1.0, repeat_last_n=1)).tokens[0]

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g,
                        admission_chunk=16)  # 64-token prompt → 4 ticks
    ra = srv.submit(PROMPTS[0], n_predict=30)
    srv.step()  # admit A (short: one tick) + first decode
    assert srv.slots and ra.output_ids, "A must be running"
    rb = srv.submit(long_prompt, n_predict=8)

    # B's admission takes 4 chunk-ticks; A must emit one token per tick
    emitted_during_admission = []
    while srv._pending is not None or not any(
            s.request is rb and not s.admitting for s in srv.slots):
        n_before = len(ra.output_ids)
        srv.step()
        emitted_during_admission.append(len(ra.output_ids) - n_before)
        assert len(emitted_during_admission) < 20, "admission never finished"
    assert sum(emitted_during_admission) >= 3, (
        f"decode stalled during admission: {emitted_during_admission}")

    srv.run()
    assert ra.output_ids == list(want_a)
    assert rb.output_ids == list(want_b)


@pytest.mark.slow
def test_per_request_sampling_single_compile():
    """Mixed per-request configs (greedy, hot, top_k=1) run through ONE
    compiled row-sampler — no recompile per distinct config (VERDICT r1
    weak #8) — and each row obeys its own parameters."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.7, n_predict=10, repeat_penalty=1.0,
                         repeat_last_n=8, seed=3)
    srv = ServingEngine(params, cfg, qcfg, slots=4, gcfg=g)

    greedy_cfg = GenerationConfig(temp=0.0, n_predict=10, repeat_penalty=1.0,
                                  repeat_last_n=1)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want_greedy = list(eng.generate(PROMPTS[0][None, :], greedy_cfg).tokens[0])

    ra = srv.submit(PROMPTS[0], gcfg=greedy_cfg)                 # greedy row
    rb = srv.submit(PROMPTS[1], gcfg=GenerationConfig(           # top_k=1 ==
        temp=1.5, top_k=1, n_predict=10, repeat_penalty=1.0,     # greedy too
        repeat_last_n=1))
    rc = srv.submit(PROMPTS[0], gcfg=GenerationConfig(
        temp=1.2, top_p=0.9, n_predict=10, repeat_penalty=1.3,
        repeat_last_n=8, seed=11))
    before = srv._jit_sample_rows._cache_size()
    srv.run()
    after = srv._jit_sample_rows._cache_size()

    assert ra.output_ids == want_greedy
    want_b = list(eng.generate(PROMPTS[1][None, :], greedy_cfg).tokens[0])
    assert rb.output_ids == want_b                   # top_k=1 is greedy
    assert len(rc.output_ids) == 10
    # one executable per batch SHAPE (admission [1] + decode [slots]), not
    # per distinct config (the jit cache is shared across engines — measure
    # growth, not absolute size)
    assert after - before <= 2

    # per-request seed reproducibility: same seed → identical tokens
    srv2 = ServingEngine(params, cfg, qcfg, slots=4, gcfg=g)
    rc2 = srv2.submit(PROMPTS[0], gcfg=GenerationConfig(
        temp=1.2, top_p=0.9, n_predict=10, repeat_penalty=1.3,
        repeat_last_n=8, seed=11))
    srv2.run()
    assert rc2.output_ids == rc.output_ids


def test_per_request_logit_bias_forces_token():
    cfg, qcfg, params = _tiny()
    srv = ServingEngine(params, cfg, qcfg, slots=2,
                        gcfg=GenerationConfig(temp=0.7, n_predict=4, seed=0))
    forced = 123
    r = srv.submit(PROMPTS[0], gcfg=GenerationConfig(
        temp=0.7, n_predict=4, repeat_penalty=1.0, repeat_last_n=1,
        logit_bias={forced: 1e9}, seed=5))
    r2 = srv.submit(PROMPTS[1], gcfg=GenerationConfig(
        temp=0.0, n_predict=4, repeat_penalty=1.0, repeat_last_n=1))
    srv.run()
    assert r.output_ids == [forced] * 4          # bias dominates sampling
    assert r2.output_ids != [forced] * 4         # neighbor row unbiased


def test_tick_batching_exactness():
    """K-tick burst decode (one dispatch per K tokens) must be INVISIBLE:
    greedy and seeded-stochastic outputs identical to tick_batch=1, stop
    tokens honored (overshoot discarded), mixed per-request configs."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=21, repeat_penalty=1.1,
                         repeat_last_n=8, seed=4)

    def run(tb):
        srv = ServingEngine(params, cfg, qcfg, slots=3, gcfg=g, tick_batch=tb)
        ra = srv.submit(PROMPTS[0])                          # greedy 21 toks
        rb = srv.submit(PROMPTS[1], gcfg=GenerationConfig(
            temp=1.1, top_p=0.9, n_predict=17, repeat_penalty=1.0,
            repeat_last_n=4, seed=33))                       # stochastic
        srv.run()
        return ra.output_ids, rb.output_ids

    a1, b1 = run(1)
    a8, b8 = run(8)
    assert a8 == a1, (a8, a1)
    assert b8 == b1, (b8, b1)
    assert len(a1) == 21 and len(b1) == 17


def test_tick_batching_stop_token_mid_burst():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=40, repeat_penalty=1.3,
                         repeat_last_n=8)
    probe = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g, tick_batch=1)
    r0 = probe.submit(PROMPTS[0])
    probe.run()
    # pick a token whose FIRST occurrence lands mid-sequence (and mid-burst)
    cut = next(i for i in range(2, 39)
               if r0.output_ids[i] not in r0.output_ids[:i])
    stop_tok = r0.output_ids[cut]

    srv = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g, tick_batch=8)
    r = srv.submit(PROMPTS[0], stop_token_ids=(stop_tok,))
    srv.run()
    assert r.finish_reason == "stop"
    assert r.output_ids == r0.output_ids[:cut + 1]  # overshoot discarded


def test_tick_batching_paged_matches_dense():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=18, repeat_penalty=1.0,
                         repeat_last_n=1)
    dense = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, tick_batch=1)
    want = [dense.submit(p) for p in PROMPTS]
    dense.run()

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, tick_batch=6,
                        paged=True, page_size=16)
    reqs = [srv.submit(p) for p in PROMPTS]
    srv.run()
    for r, w in zip(reqs, want):
        assert r.output_ids == w.output_ids


@pytest.mark.parametrize("version", [1, 2])
@pytest.mark.slow
def test_per_request_mirostat(version):
    """Per-request mirostat v1/v2 (Generate.cc:138,176): a mirostat request
    in a mixed batch produces EXACTLY the tokens it produces alone in the
    engine (per-row mu state + per-row keys isolate it), it is reproducible
    per seed, and a greedy neighbor still matches its solo run."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.7, n_predict=10, repeat_penalty=1.0,
                         repeat_last_n=1, seed=2)
    miro = GenerationConfig(temp=0.8, mirostat=version, mirostat_tau=4.0,
                            mirostat_eta=0.3, n_predict=10,
                            repeat_penalty=1.0, repeat_last_n=1, seed=17)
    greedy = GenerationConfig(temp=0.0, n_predict=10, repeat_penalty=1.0,
                              repeat_last_n=1)

    # solo: the mirostat request alone in a serving engine
    solo = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g)
    rs = solo.submit(PROMPTS[0], gcfg=miro)
    solo.run()
    assert len(rs.output_ids) == 10

    # mixed batch: same mirostat request next to greedy + hot rows
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want_greedy = list(eng.generate(PROMPTS[1][None, :], greedy).tokens[0])
    srv = ServingEngine(params, cfg, qcfg, slots=3, gcfg=g)
    rm = srv.submit(PROMPTS[0], gcfg=miro)
    rg = srv.submit(PROMPTS[1], gcfg=greedy)
    rh = srv.submit(PROMPTS[2], gcfg=GenerationConfig(
        temp=1.3, top_p=0.9, n_predict=10, repeat_penalty=1.0,
        repeat_last_n=1, seed=5))
    srv.run()
    assert rm.output_ids == rs.output_ids      # batch placement is invisible
    assert rg.output_ids == want_greedy        # neighbor rows unaffected
    assert len(rh.output_ids) == 10


@pytest.mark.slow
def test_mirostat_tick_burst_matches_per_tick():
    """mu is carried through the device-side K-tick scan identically to the
    host per-tick path."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.7, n_predict=16, repeat_penalty=1.0,
                         repeat_last_n=1, seed=3)
    miro = GenerationConfig(temp=0.9, mirostat=2, mirostat_tau=5.0,
                            mirostat_eta=0.1, n_predict=16,
                            repeat_penalty=1.1, repeat_last_n=4, seed=23)

    def run(tb):
        srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, tick_batch=tb)
        r = srv.submit(PROMPTS[0], gcfg=miro)
        srv.run()
        return r.output_ids

    a, b = run(1), run(8)
    assert a == b and len(a) == 16


def test_stop_tokens_free_slots_early():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=50, repeat_penalty=1.0,
                         repeat_last_n=1)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    ref_tokens = eng.generate(PROMPTS[0][None, :], g).tokens[0]
    stop = ref_tokens[3]  # force an early stop on the 4th generated token

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g)
    r1 = srv.submit(PROMPTS[0], stop_token_ids=(stop,))
    r2 = srv.submit(PROMPTS[1])
    r3 = srv.submit(PROMPTS[2])
    srv.run()
    assert r1.finish_reason == "stop"
    assert r1.output_ids[-1] == stop and len(r1.output_ids) <= 4 + 1
    assert r2.finish_reason == "length" and len(r2.output_ids) == 50
    assert r3.finished


def test_streaming_callback_and_metrics():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=5, repeat_penalty=1.0,
                         repeat_last_n=1)
    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g)
    seen = []
    r = srv.submit(PROMPTS[0], on_token=lambda t, req: seen.append(t))
    srv.run()
    assert seen == r.output_ids
    assert r.first_token_t >= r.submit_t
    assert r.done_t >= r.first_token_t


def test_sampled_batch_runs_and_fills_slots():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.7, top_p=0.9, n_predict=8, seed=1)
    srv = ServingEngine(params, cfg, qcfg, slots=3, gcfg=g)
    reqs = [srv.submit(p) for p in PROMPTS]
    done = srv.run()
    assert len(done) == len(PROMPTS)
    for r in reqs:
        assert len(r.output_ids) == 8
        assert all(0 <= t < cfg.vocab_size for t in r.output_ids)


def test_paged_batched_greedy_matches_single():
    """Paged serving (block-table KV) reproduces the slot-pool engine's
    tokens exactly — pages, growth across boundaries, recycling and the
    dead-page write target must all be invisible to the math."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=12, repeat_penalty=1.0,
                         repeat_last_n=1)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want = [eng.generate(p[None, :], g).tokens[0] for p in PROMPTS]

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                        page_size=16)
    reqs = [srv.submit(p, n_predict=12) for p in PROMPTS]
    srv.run()
    for r, w in zip(reqs, want):
        assert r.output_ids == list(w), (r.request_id, r.output_ids, w)
    # every non-dead page is back in the free list
    assert srv.allocator.n_free == srv.page_cache.n_pages - 1


@pytest.mark.slow
def test_paged_with_per_request_sampling():
    """Paged KV × per-request sampling compose: a greedy-configured request
    inside a hot-sampling engine, under block-table paging, still matches
    the solo greedy run; its hot neighbor still draws stochastically —
    and per-request seeds reproduce across engines."""
    cfg, qcfg, params = _tiny()
    engine_g = GenerationConfig(temp=1.0, n_predict=12, seed=9)
    greedy = GenerationConfig(temp=0.0, n_predict=12, repeat_penalty=1.0,
                              repeat_last_n=1)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want = list(eng.generate(PROMPTS[0][None, :], greedy).tokens[0])

    def run_once():
        srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=engine_g,
                            paged=True, page_size=16)
        ra = srv.submit(PROMPTS[0], gcfg=greedy)
        rb = srv.submit(PROMPTS[1], gcfg=GenerationConfig(
            temp=1.3, top_p=0.9, n_predict=12, repeat_penalty=1.0,
            repeat_last_n=1, seed=21))
        srv.run()
        return ra.output_ids, rb.output_ids

    a1, b1 = run_once()
    a2, b2 = run_once()
    assert a1 == want and a2 == want
    assert b1 == b2                      # per-request seed reproducibility
    assert len(b1) == 12


def test_paged_chunked_admission_reserves_pages():
    """Regression (r2 review): pages for a chunked admission must be
    reserved when the admission STARTS — an active slot growing across a
    page boundary during the multi-tick prefill used to steal them, and
    _finish_admission then crashed the whole engine with MemoryError."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=24, repeat_penalty=1.0,
                         repeat_last_n=1)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    a_prompt = np.arange(30, 44, dtype=np.int32)             # 14 tokens
    long_prompt = np.arange(10, 74, dtype=np.int32)          # 64 tokens
    want_a = eng.generate(a_prompt[None, :], g).tokens[0]
    want_b = eng.generate(long_prompt[None, :], GenerationConfig(
        temp=0.0, n_predict=8, repeat_penalty=1.0, repeat_last_n=1)).tokens[0]

    # 6-page pool (1 dead): B's check at tick 0 sees 4 free == 4 needed, but
    # A (14 tokens, page 16) crosses a page boundary during B's 4 chunk
    # ticks — the old code's deferred alloc then blew up; now B's pages are
    # reserved up-front and A's growth cancels/requeues the admission
    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                        page_size=16, n_pages=6, admission_chunk=16,
                        tick_batch=1)
    ra = srv.submit(a_prompt, n_predict=24)
    srv.step()                                               # admit A + decode
    rb = srv.submit(long_prompt, n_predict=8)                # 4 chunk-ticks
    srv.run()                                                # must not raise
    assert ra.output_ids == list(want_a)
    assert rb.output_ids == list(want_b)


def test_paged_pool_smaller_than_dense():
    """A page pool sized well below slots*max_len still serves the queue
    (the capacity win vs the reference's worst-case preallocation)."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=6, repeat_penalty=1.0,
                         repeat_last_n=1)
    # 2 slots * 128 max_len = 16 pages dense-equivalent; give it 9 (+1 dead)
    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                        page_size=16, n_pages=10)
    reqs = [srv.submit(p, n_predict=6) for p in PROMPTS]
    srv.run()
    assert all(r.finished for r in reqs)


@pytest.mark.slow
def test_serving_with_tensor_parallel_forward():
    """Continuous batching through the shard_map TP forward (multi-device
    serving): tokens must match the single-device slot engine exactly."""
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.parallel.sharding import make_mesh, shard_params
    from tinychatengine_tpu.parallel.tp import make_tp_forward

    cfg = ModelConfig(
        name="tiny_tp", family="llama", num_heads=8, num_kv_heads=4,
        num_layers=2, max_sqlen=128, embed_dim=1024, hidden_dim=1024,
        vocab_size=512, rms_norm_eps=1e-5)
    qcfg = QuantConfig(scheme="fp")
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    prompts = [np.array([5, 9, 11], np.int32), np.array([7, 3], np.int32),
               np.array([40, 41, 42, 43], np.int32)]

    params1 = llama.init_random_params(cfg, qcfg, seed=3)
    srv1 = ServingEngine(params1, cfg, qcfg, slots=2, gcfg=g)
    reqs1 = [srv1.submit(p) for p in prompts]
    srv1.run()

    params4 = llama.init_random_params(cfg, qcfg, seed=3, tp_degree=4)
    mesh = make_mesh(n_data=1, n_model=4)
    sp = shard_params(params4, mesh)
    srv4 = ServingEngine(sp, cfg, qcfg, slots=2, gcfg=g,
                         forward_fn=make_tp_forward(mesh))
    reqs4 = [srv4.submit(p) for p in prompts]
    srv4.run()

    for r1, r4 in zip(reqs1, reqs4):
        assert r1.output_ids == r4.output_ids


@pytest.mark.slow
def test_paged_preemption_preserves_outputs():
    """A pool too small for all sequences forces preemption; preempted
    requests resume with progress folded into the prompt, and greedy outputs
    still match the unconstrained run exactly."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=20, repeat_penalty=1.0,
                         repeat_last_n=1)
    want_srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                             page_size=16)  # ample pool
    wreqs = [want_srv.submit(p, n_predict=20) for p in PROMPTS[:3]]
    want_srv.run()

    tight = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                          page_size=16, n_pages=6)  # 5 usable pages
    treqs = [tight.submit(p, n_predict=20) for p in PROMPTS[:3]]
    tight.run()
    for w, t in zip(wreqs, treqs):
        assert w.output_ids == t.output_ids, (w.output_ids, t.output_ids)
    assert tight.allocator.n_free == tight.page_cache.n_pages - 1


def test_paged_pool_too_small_raises():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=4, repeat_penalty=1.0,
                         repeat_last_n=1)
    srv = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g, paged=True,
                        page_size=16, n_pages=2)  # 1 usable page
    srv.submit(np.arange(1, 30, dtype=np.int32))  # needs 2 pages to prefill
    import pytest as _pytest
    with _pytest.raises(MemoryError):
        srv.run()


@pytest.mark.slow
def test_paged_serving_with_tensor_parallel():
    """Paged KV + block tables + TP shard_map forward: tokens match the
    single-device paged engine exactly."""
    from tinychatengine_tpu.models import llama
    from tinychatengine_tpu.parallel.sharding import make_mesh, shard_params
    from tinychatengine_tpu.parallel.tp import make_tp_forward

    cfg = ModelConfig(
        name="tiny_tp", family="llama", num_heads=8, num_kv_heads=4,
        num_layers=2, max_sqlen=128, embed_dim=1024, hidden_dim=1024,
        vocab_size=512, rms_norm_eps=1e-5)
    qcfg = QuantConfig(scheme="fp")
    g = GenerationConfig(temp=0.0, n_predict=6, repeat_penalty=1.0,
                         repeat_last_n=1)
    prompts = [np.array([5, 9, 11], np.int32), np.array([7, 3], np.int32)]

    params1 = llama.init_random_params(cfg, qcfg, seed=4)
    srv1 = ServingEngine(params1, cfg, qcfg, slots=2, gcfg=g, paged=True,
                         page_size=16)
    r1 = [srv1.submit(p) for p in prompts]
    srv1.run()

    params4 = llama.init_random_params(cfg, qcfg, seed=4, tp_degree=4)
    mesh = make_mesh(n_data=1, n_model=4)
    srv4 = ServingEngine(shard_params(params4, mesh), cfg, qcfg, slots=2,
                         gcfg=g, paged=True, page_size=16,
                         forward_fn=make_tp_forward(mesh))
    r4 = [srv4.submit(p) for p in prompts]
    srv4.run()
    for a, b in zip(r1, r4):
        assert a.output_ids == b.output_ids


@pytest.mark.slow
def test_speculative_serving_exact_and_fewer_ticks():
    """PLD-eligible (greedy) requests through speculative serving: tokens
    IDENTICAL to the plain serving engine, in fewer decode dispatches
    (accepted draft runs emit several tokens per tick on repetitive
    prompts)."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=24, repeat_penalty=1.0,
                         repeat_last_n=1)
    rep = np.tile(np.array([5, 9, 11, 7], np.int32), 6)   # repetitive prompt

    plain = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, tick_batch=1)
    want = [plain.submit(p) for p in (rep, PROMPTS[0], PROMPTS[2])]
    plain.run()

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, tick_batch=1,
                        speculative=True)
    got = [srv.submit(p) for p in (rep, PROMPTS[0], PROMPTS[2])]
    srv.run()
    for w, r in zip(want, got):
        assert r.output_ids == w.output_ids, (r.output_ids, w.output_ids)
    # speculation must actually have accepted drafts: more tokens than ticks
    assert srv._spec_stats["ticks"] > 0
    assert srv._spec_stats["tokens"] > srv._spec_stats["ticks"], \
        srv._spec_stats


def test_speculative_pauses_for_stochastic_neighbor():
    """A non-greedy request in the batch disables spec ticks while it is
    active (exactness requires an all-greedy batch) — everyone's output
    still matches the non-speculative engine."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=16, repeat_penalty=1.0,
                         repeat_last_n=1)
    hot = GenerationConfig(temp=1.2, top_p=0.9, n_predict=16,
                           repeat_penalty=1.0, repeat_last_n=1, seed=7)

    def run(spec):
        srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, tick_batch=1,
                            speculative=spec)
        ra = srv.submit(PROMPTS[0])
        rb = srv.submit(PROMPTS[1], gcfg=hot)
        srv.run()
        return ra.output_ids, rb.output_ids

    a0, b0 = run(False)
    a1, b1 = run(True)
    assert a1 == a0 and b1 == b0


def test_speculative_stop_token_mid_run():
    """A stop token inside an accepted draft run truncates exactly there."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=40, repeat_penalty=1.0,
                         repeat_last_n=1)
    rep = np.arange(10, 40, dtype=np.int32)   # diverse greedy continuation
    probe = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g, tick_batch=1)
    r0 = probe.submit(rep)
    probe.run()
    cut = next(i for i in range(2, 39)
               if r0.output_ids[i] not in r0.output_ids[:i])
    stop_tok = r0.output_ids[cut]

    srv = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g, tick_batch=1,
                        speculative=True)
    r = srv.submit(rep, stop_token_ids=(stop_tok,))
    srv.run()
    assert r.finish_reason == "stop"
    assert r.output_ids == r0.output_ids[:cut + 1]


def test_speculative_greedy_with_logit_bias_not_spec_eligible():
    """Greedy + logit_bias must NOT ride the spec path (the verify computes
    a raw argmax chain and would drop the bias) — the bias keeps winning."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=6, repeat_penalty=1.0,
                         repeat_last_n=1)
    forced = 99
    srv = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g, speculative=True)
    r = srv.submit(PROMPTS[0], gcfg=GenerationConfig(
        temp=0.0, n_predict=6, repeat_penalty=1.0, repeat_last_n=1,
        logit_bias={forced: 1e9}))
    srv.run()
    assert r.output_ids == [forced] * 6


# ---- prefix caching ---------------------------------------------------------

def test_prefix_cache_exact_across_shared_header():
    """Two prompts sharing a 100-token header: the second admission splices
    the cached prefix and prefills only its tail — outputs must match the
    no-cache engine exactly for both."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=10, repeat_penalty=1.0,
                         repeat_last_n=1)
    shared = np.arange(10, 110, dtype=np.int32)
    p1 = np.concatenate([shared, np.array([5, 9, 11], np.int32)])
    p2 = np.concatenate([shared, np.array([7, 3, 2, 8], np.int32)])

    cold = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g)
    w1 = cold.submit(p1); cold.run(); cold.done.clear()
    w2 = cold.submit(p2); cold.run()

    srv = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g,
                        prefix_cache_entries=2, prefix_min=16)
    r1 = srv.submit(p1); srv.run(); srv.done.clear()
    assert srv.prefix_stats["stores"] == 1
    r2 = srv.submit(p2); srv.run()
    assert r1.output_ids == w1.output_ids
    assert r2.output_ids == w2.output_ids
    assert srv.prefix_stats["hits"] == 1
    assert srv.prefix_stats["hit_tokens"] == 100


@pytest.mark.slow
def test_prefix_cache_partial_and_shorter_prompt():
    """A new prompt that is a strict PREFIX of a stored one still hits
    (causal KV[0:m) depends only on tokens[0:m)), capped at n-1 so the final
    chunk computes first-token logits."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    long = np.arange(10, 110, dtype=np.int32)
    short = long[:60].copy()

    cold = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g)
    w = cold.submit(short); cold.run()

    srv = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g,
                        prefix_cache_entries=2, prefix_min=16)
    srv.submit(long); srv.run(); srv.done.clear()
    r = srv.submit(short); srv.run()
    assert r.output_ids == w.output_ids
    assert srv.prefix_stats["hits"] == 1
    assert srv.prefix_stats["hit_tokens"] == 59   # capped at n-1


def test_prefix_cache_lru_eviction():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=4, repeat_penalty=1.0,
                         repeat_last_n=1)
    pa = np.arange(10, 90, dtype=np.int32)
    pb = np.arange(120, 200, dtype=np.int32)

    srv = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g,
                        prefix_cache_entries=1, prefix_min=16)
    srv.submit(pa); srv.run(); srv.done.clear()
    srv.submit(pb); srv.run(); srv.done.clear()   # evicts pa
    assert srv.prefix_stats["stores"] == 2
    srv.submit(pa); srv.run()                     # miss again → re-store
    assert srv.prefix_stats["hits"] == 0
    assert srv.prefix_stats["stores"] == 3


@pytest.mark.slow
def test_prefix_cache_paged_and_int8_kv():
    """Prefix reuse composes with the paged pool and the int8 KV cache."""
    shared = np.arange(10, 110, dtype=np.int32)
    p1 = np.concatenate([shared, np.array([5, 9], np.int32)])
    p2 = np.concatenate([shared, np.array([7, 3, 2], np.int32)])
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    for paged, kv in ((True, "bf16"), (False, "int8")):
        cfg, _, params = _tiny()
        qcfg = QuantConfig(scheme="fp", kv_cache_dtype=kv)
        cold = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=paged)
        want = [cold.submit(p) for p in (p1, p2)]
        cold.run()
        srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=paged,
                            prefix_cache_entries=2, prefix_min=16)
        r1 = srv.submit(p1); srv.run(); srv.done.clear()
        r2 = srv.submit(p2); srv.run()
        assert r1.output_ids == want[0].output_ids, (paged, kv)
        assert r2.output_ids == want[1].output_ids, (paged, kv)
        assert srv.prefix_stats["hits"] == 1, (paged, kv)


def test_cancel_all_lifecycle_stages():
    """ServingEngine.cancel aborts a request at every stage — queued,
    mid-chunked-admission, actively decoding — frees the slot for reuse,
    and never perturbs the surviving requests' outputs."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=12, repeat_penalty=1.0,
                         repeat_last_n=1)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want_a = list(eng.generate(PROMPTS[0][None, :], g).tokens[0])
    long_prompt = np.arange(10, 74, dtype=np.int32)  # 4 admission chunks

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g,
                        admission_chunk=16, tick_batch=1)  # 1 token per step
    ra = srv.submit(PROMPTS[0], n_predict=12)
    rq = srv.submit(PROMPTS[2], n_predict=12)
    # queued cancel (before any step): rq never ran
    assert srv.cancel(rq) is True
    assert rq.finished and rq.finish_reason == "cancelled"
    assert rq.output_ids == [] and rq in srv.done
    assert srv.cancel(rq) is False  # idempotent on finished requests

    srv.step()  # admits ra
    rb = srv.submit(long_prompt, n_predict=12)
    srv.step()  # starts rb's chunked admission
    assert srv._pending is not None
    # mid-admission cancel: only prefill work lost, slot freed
    assert srv.cancel(rb) is True
    assert srv._pending is None and rb.finish_reason == "cancelled"

    # active cancel: ra is decoding; cancel mid-stream
    while len(ra.output_ids) < 4:
        srv.step()
    assert srv.cancel(ra) is True
    assert ra.finish_reason == "cancelled"
    assert ra.output_ids == want_a[:len(ra.output_ids)]
    assert srv.n_active == 0

    # the freed slots are fully reusable: a fresh request matches solo
    rc = srv.submit(PROMPTS[0], n_predict=12)
    srv.run()
    assert rc.output_ids == want_a and rc.finish_reason == "length"


def test_cancel_paged_frees_pages():
    """Cancelling an active paged request returns every page to the pool
    and points the slot's table row back at the dead page."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=10, repeat_penalty=1.0,
                         repeat_last_n=1)
    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                        page_size=16, tick_batch=1)
    free0 = srv.allocator.n_free
    ra = srv.submit(PROMPTS[0], n_predict=10)
    rb = srv.submit(PROMPTS[1], n_predict=10)
    for _ in range(3):
        srv.step()
    assert srv.cancel(ra) is True
    assert srv.allocator.n_free > free0 - srv.allocator.pages_needed(
        cfg.max_sqlen)
    assert all(p == srv._dead_page
               for p in srv._tables[[i for i, s in enumerate(srv.slots)
                                     if s.request is None][0]])
    srv.run()
    assert rb.finished and srv.allocator.n_free == free0


def _lse(x):
    m = np.max(x)
    return m + np.log(np.sum(np.exp(x - m)))


@pytest.mark.slow
def test_logprobs_match_forward_oracle():
    """OpenAI-style logprobs: the engine's per-token chosen-logprob and
    top-k records must equal log_softmax of the raw forward chain — across
    the fused admission (first token) and the burst decode path — and a
    mixed batch must leave the non-requesting row untouched."""
    import jax

    from tinychatengine_tpu.generation import kv_cache as kvc
    from tinychatengine_tpu.models import llama as llm

    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, logprobs_k=4)
    r1 = srv.submit(PROMPTS[0], n_predict=8, logprobs=3)
    r2 = srv.submit(PROMPTS[1], n_predict=8)
    srv.run()

    assert r2.output_logprobs == [] and r2.output_top_logprobs == []
    assert len(r1.output_ids) == 8
    assert len(r1.output_logprobs) == 8
    assert all(len(t) == 3 for t in r1.output_top_logprobs)

    # raw-forward oracle over the emitted chain (admission token included)
    fwd = jax.jit(llm.forward, static_argnames=("cfg",))
    cache = kvc.init_cache(cfg.num_layers, 1, cfg.max_sqlen,
                           cfg.num_kv_heads, cfg.head_dim)
    logits, cache = fwd(params, cfg, jnp.asarray(PROMPTS[0][None]), cache,
                        jnp.int32(0))
    pos = len(PROMPTS[0])
    for tok_id, lp, top in zip(r1.output_ids, r1.output_logprobs,
                               r1.output_top_logprobs):
        lg = np.asarray(logits, np.float32)[0]
        assert abs((lg[tok_id] - _lse(lg)) - lp) < 1e-3
        # greedy: the chosen token IS the top-1 alternative
        assert top[0][0] == tok_id
        assert abs(top[0][1] - lp) < 1e-5
        # top list is descending and log-probs are <= 0
        lps = [l for _, l in top]
        assert lps == sorted(lps, reverse=True)
        assert all(l <= 1e-6 for l in lps)
        logits, cache = fwd(params, cfg, jnp.asarray([[tok_id]]), cache,
                            jnp.int32(pos))
        pos += 1

    # logprobs must not perturb the tokens themselves (vs a plain solo run)
    solo = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g)
    s1 = solo.submit(PROMPTS[0], n_predict=8)
    solo.run()
    assert r1.output_ids == s1.output_ids


def test_logprobs_paged_and_validation():
    """Paged engine serves logprobs through its decode-multi variant;
    submit() rejects k beyond the engine's compiled top-k width."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=6, repeat_penalty=1.0,
                         repeat_last_n=1)
    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                        page_size=16, n_pages=32, logprobs_k=2)
    with pytest.raises(ValueError):
        srv.submit(PROMPTS[0], logprobs=3)
    r = srv.submit(PROMPTS[0], n_predict=6, logprobs=2)
    r0 = srv.submit(PROMPTS[1], n_predict=6, logprobs=0)  # chosen-only
    srv.run()
    assert len(r.output_logprobs) == len(r.output_ids) == 6
    assert all(len(t) == 2 for t in r.output_top_logprobs)
    assert len(r0.output_logprobs) == 6
    assert all(t == [] for t in r0.output_top_logprobs)


# ---- multimodal (input_embeds) requests --------------------------------------
# The VLM serving path (VILA/LLaVA over the API): Request.input_embeds
# replaces the embedding lookup for the whole prompt; ids carry 0 at image
# slots. Exactness invariant: same embeds through the single-request Engine.

def _embeds_for(params, ids, image_rows=()):
    """Prompt embeds = embed-table rows, with image_rows positions replaced
    by synthetic 'image' vectors (what a CLIP mm_projector splice yields)."""
    emb = np.asarray(jnp.take(jnp.asarray(params.embed),
                              jnp.asarray(np.asarray(ids, np.int32)), axis=0),
                     np.float32)
    rng = np.random.default_rng(7)
    for pos in image_rows:
        emb[pos] = rng.standard_normal(emb.shape[1]).astype(np.float32) * 0.05
    return emb


def test_embeds_request_matches_engine():
    """A multimodal request decodes exactly like the same embeds through the
    solo Engine, while sharing the batch with ordinary text requests."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=10, repeat_penalty=1.0,
                         repeat_last_n=1)
    ids = np.array([3, 0, 0, 0, 9, 17], np.int32)
    emb = _embeds_for(params, ids, image_rows=(1, 2, 3))

    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want = eng.generate(ids[None], g,
                        input_embeds=jnp.asarray(emb, jnp.bfloat16)[None]
                        ).tokens[0]
    want_txt = eng.generate(PROMPTS[0][None], g).tokens[0]
    # the image rows must actually change the output (otherwise this test
    # would pass with input_embeds silently dropped)
    want_ids_only = eng.generate(ids[None], g).tokens[0]
    assert list(want) != list(want_ids_only)

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g)
    rm = srv.submit(ids, n_predict=10, input_embeds=emb)
    rt = srv.submit(PROMPTS[0], n_predict=10)
    srv.run()
    assert rm.output_ids == list(want)
    assert rt.output_ids == list(want_txt)

    with pytest.raises(ValueError):  # shape validation
        srv.submit(ids, input_embeds=emb[:3])


@pytest.mark.slow
def test_embeds_chunked_admission_exact():
    """A long multimodal prompt admits through the chunked prefill path
    (intermediate chunks slice the embeds; the fused final chunk pads them)."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    ids = (np.arange(20, 84, dtype=np.int32) % (cfg.vocab_size - 1)) + 1
    ids[5:21] = 0
    emb = _embeds_for(params, ids, image_rows=range(5, 21))

    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want = eng.generate(ids[None], g,
                        input_embeds=jnp.asarray(emb, jnp.bfloat16)[None]
                        ).tokens[0]
    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g,
                        admission_chunk=16)
    r = srv.submit(ids, n_predict=8, input_embeds=emb)
    srv.run()
    assert r.output_ids == list(want)


def test_embeds_bypass_prefix_cache():
    """Multimodal requests neither store nor hit the token-keyed KV prefix
    cache (ids are 0 at image slots, so KV is NOT a function of ids), and a
    later text request with identical ids is not contaminated."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=6, repeat_penalty=1.0,
                         repeat_last_n=1)
    ids = (np.arange(1, 65, dtype=np.int32) % (cfg.vocab_size - 1)) + 1
    emb = _embeds_for(params, ids, image_rows=(0, 1, 2, 3))

    srv = ServingEngine(params, cfg, qcfg, slots=1, gcfg=g,
                        prefix_cache_entries=2, prefix_min=16)
    srv.submit(ids, n_predict=6, input_embeds=emb)
    srv.run()
    assert srv.prefix_stats == {"hits": 0, "hit_tokens": 0, "stores": 0}

    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want = eng.generate(ids[None], g).tokens[0]
    rt = srv.submit(ids, n_predict=6)
    srv.run()
    assert rt.output_ids == list(want)
    assert srv.prefix_stats["hits"] == 0 and srv.prefix_stats["stores"] == 1


def test_embeds_preemption_resume_exact():
    """A preempted multimodal request resumes exactly: the recompute prefill
    extends the embeds with the emitted tokens' embed-table rows."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=12, repeat_penalty=1.0,
                         repeat_last_n=1)
    ids = np.array([3, 0, 0, 9, 17, 4, 8], np.int32)
    emb = _embeds_for(params, ids, image_rows=(1, 2))

    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want = eng.generate(ids[None], g,
                        input_embeds=jnp.asarray(emb, jnp.bfloat16)[None]
                        ).tokens[0]

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                        page_size=16, tick_batch=1)  # no bursts: preempt
    r = srv.submit(ids, n_predict=12, input_embeds=emb)  # mid-generation
    for _ in range(5):
        srv.step()
    assert r.output_ids and not r.finished
    slot_idx = next(i for i, s in enumerate(srv.slots) if s.request is r)
    srv._preempt(slot_idx)
    assert len(r.input_embeds) == len(r.prompt_ids)
    srv.run()
    assert r.output_ids == list(want)


# ---- non-llama families through the serving engine ---------------------------
# The reference serves OPT (SmoothQuant W8A8) and StarCoder interactively;
# the serving engine must be family-agnostic (dense slot cache; paged KV is
# llama-only since page_table rides llama.forward).

def test_serving_opt_w8a8_matches_engine():
    from tinychatengine_tpu.models import opt
    cfg = ModelConfig(
        name="tiny_opt", family="opt", num_heads=4, num_kv_heads=4,
        num_layers=2, max_sqlen=64, embed_dim=128, hidden_dim=256,
        vocab_size=300)
    qcfg = QuantConfig(scheme="w8a8")
    params = opt.init_random_params(cfg, quantized=True, seed=0)
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen,
                 forward_fn=opt.forward)
    want = [eng.generate(p[None], g).tokens[0] for p in PROMPTS[:3]]

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g,
                        forward_fn=opt.forward)
    assert srv.cache.k.dtype == jnp.int8  # static-scale int8 KV, not bf16
    reqs = [srv.submit(p, n_predict=8) for p in PROMPTS[:3]]
    srv.run()
    for r, w in zip(reqs, want):
        assert r.output_ids == list(w)

    with pytest.raises(NotImplementedError):
        ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, paged=True,
                      forward_fn=opt.forward)


def test_serving_gptbigcode_matches_engine():
    from tinychatengine_tpu.models import gptbigcode
    cfg = ModelConfig(
        name="tiny_bigcode", family="gptbigcode", num_heads=4, num_kv_heads=1,
        num_layers=2, max_sqlen=64, embed_dim=128, hidden_dim=256,
        vocab_size=300)
    qcfg = QuantConfig(scheme="fp")
    params = gptbigcode.init_random_params(cfg, seed=0)
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen,
                 forward_fn=gptbigcode.forward)
    want = [eng.generate(p[None], g).tokens[0] for p in PROMPTS[:3]]

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g,
                        forward_fn=gptbigcode.forward)
    reqs = [srv.submit(p, n_predict=8) for p in PROMPTS[:3]]
    srv.run()
    for r, w in zip(reqs, want):
        assert r.output_ids == list(w)


def test_kmax_bucketing_bounds_executables():
    """ADVICE r4 (medium): top_k_max is a STATIC jit arg on the decode/admit
    executables; a client cycling top_k values must map onto a FIXED bucket
    set, not one executable per distinct value — while per-row draws stay
    exact (sample_rows clips per-row k_eff)."""
    from tinychatengine_tpu.runtime.serving import _KMAX_BUCKETS, _kmax_bucket

    assert _kmax_bucket(0) == 0           # disabled / no rows
    assert _kmax_bucket(-3) == 0
    assert _kmax_bucket(1) == 8
    assert _kmax_bucket(8) == 8
    assert _kmax_bucket(9) == 64
    assert _kmax_bucket(64) == 64
    assert _kmax_bucket(65) == 256
    assert _kmax_bucket(1024) == 1024
    assert _kmax_bucket(5000) == 0        # beyond buckets → exact sorted path
    # every distinct top_k in 1..2048 lands in the fixed set
    assert {_kmax_bucket(k) for k in range(1, 2049)} <= set(_KMAX_BUCKETS) | {0}

    # engine-level: cycling top_k across requests produces bucketed features
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=4, repeat_penalty=1.0,
                         repeat_last_n=1)
    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g)
    seen = set()
    for i, k in enumerate([3, 9, 40, 77]):
        srv.submit(PROMPTS[i % len(PROMPTS)], n_predict=4,
                   gcfg=GenerationConfig(temp=0.8, top_k=k, seed=i,
                                         n_predict=4, repeat_penalty=1.0,
                                         repeat_last_n=1))
        while srv.queue or srv._pending is not None:
            srv.step()
        seen.add(srv._row_features()[3])
    srv.run()
    assert seen <= set(_KMAX_BUCKETS) | {0}
    assert len(seen) <= 3  # 4 distinct top_k values → at most {8, 64, 256}


def test_paged_gptbigcode_matches_dense():
    """Paged KV beyond the llama family (VERDICT r4 weak #3): GPTBigCode's
    MQA decode rides the same page pool / flash_decode_paged path — greedy
    outputs must equal the dense slot cache, including page growth and
    tick bursts."""
    from tinychatengine_tpu.models import gptbigcode
    cfg = ModelConfig(
        name="tiny_bigcode", family="gptbigcode", num_heads=4, num_kv_heads=1,
        num_layers=2, max_sqlen=64, embed_dim=128, hidden_dim=256,
        vocab_size=300)
    qcfg = QuantConfig(scheme="fp")
    params = gptbigcode.init_random_params(cfg, seed=0)
    g = GenerationConfig(temp=0.0, n_predict=18, repeat_penalty=1.1,
                         repeat_last_n=8)

    dense = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, tick_batch=1,
                          forward_fn=gptbigcode.forward)
    want = [dense.submit(p) for p in PROMPTS]
    dense.run()

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g, tick_batch=6,
                        paged=True, page_size=16,
                        forward_fn=gptbigcode.forward)
    reqs = [srv.submit(p) for p in PROMPTS]
    srv.run()
    for r, w in zip(reqs, want):
        assert r.output_ids == w.output_ids, (r.request_id,
                                              r.output_ids, w.output_ids)


def test_batched_admission_exact():
    """r5 batched admission (R queue-head requests in ONE dispatch) must be
    invisible: greedy AND seeded-sampled outputs, logprobs included, equal
    the single-admission path (_batch_admit forced off), with mixed prompt
    lengths padding to a common bucket."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=9, repeat_penalty=1.1,
                         repeat_last_n=8, seed=3)
    sampled = GenerationConfig(temp=1.1, top_k=12, top_p=0.9, n_predict=9,
                               repeat_penalty=1.2, repeat_last_n=8, seed=77)

    def run(batch_admit):
        srv = ServingEngine(params, cfg, qcfg, slots=4, gcfg=g, tick_batch=4)
        srv._batch_admit = batch_admit
        reqs = [srv.submit(p, n_predict=9,
                           gcfg=sampled if i % 2 else None,
                           logprobs=2 if i == 2 else None)
                for i, p in enumerate(PROMPTS)]
        srv.run()
        return srv, reqs

    s1, want = run(False)
    s2, got = run(True)
    assert s1.tick_stats["batch_admits"] == 0
    assert s2.tick_stats["batch_admits"] >= 1
    assert s2.tick_stats["batch_admit_reqs"] >= 4
    for w, r in zip(want, got):
        assert r.output_ids == w.output_ids, (r.request_id, r.output_ids,
                                              w.output_ids)
        assert r.output_logprobs == w.output_logprobs
        assert r.output_top_logprobs == w.output_top_logprobs
        assert r.finish_reason == w.finish_reason


@pytest.mark.slow
def test_admission_phase_decode_stays_single_tick():
    """While a long prompt admits chunk-by-chunk, decode ticks stay SINGLE
    (no bursts) — a measured scheduling decision, not an accident: decode
    bursts during the admission phase were tried twice on the long-context
    bench (unconditional burst-4 and full-occupancy-gated burst-4) and both
    LOST to the single-tick throttle (47.4 / 45.8 vs 52.8 tok/s — bursting
    front-loads decode into lower-occupancy dispatches). This pins the
    policy so a refactor doesn't silently re-introduce it."""
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=24, repeat_penalty=1.0,
                         repeat_last_n=1)
    long_prompt = np.arange(10, 74, dtype=np.int32)  # 64 tokens → 4 chunks

    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    want_a = list(eng.generate(PROMPTS[0][None, :], g).tokens[0])
    want_b = list(eng.generate(long_prompt[None, :], GenerationConfig(
        temp=0.0, n_predict=8, repeat_penalty=1.0,
        repeat_last_n=1)).tokens[0])

    srv = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g,
                        admission_chunk=16, tick_batch=8)
    ra = srv.submit(PROMPTS[0], n_predict=24)
    srv.step()  # admit A + first decode
    rb = srv.submit(long_prompt, n_predict=8)

    steps = 0
    mid_admission_bursts = 0
    saw_mid_admission_single = False
    while srv._pending is not None or not any(
            s.request is rb and not s.admitting for s in srv.slots):
        b0, s0 = srv.tick_stats["bursts"], srv.tick_stats["single_ticks"]
        srv.step()
        if srv._pending is not None:  # still mid-admission AFTER the step
            mid_admission_bursts += srv.tick_stats["bursts"] - b0
            saw_mid_admission_single |= srv.tick_stats["single_ticks"] > s0
        steps += 1
        assert steps < 20, "admission never finished"
    assert mid_admission_bursts == 0, srv.tick_stats
    assert saw_mid_admission_single, srv.tick_stats
    srv.run()
    assert ra.output_ids == want_a
    assert rb.output_ids == want_b
