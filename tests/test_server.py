"""OpenAI-compatible HTTP serving front-end (runtime/server.py).

The reference has no network surface (llm/application/chat.cc is a blocking
terminal REPL); these tests pin the REST layer's contract: wire shapes,
SSE streaming, greedy exactness vs a solo Engine run, host-side stop-string
cancellation, concurrent clients over continuous batching, and 400-class
input validation.
"""

import http.client
import json
import threading

import jax.numpy as jnp
import numpy as np
import pytest

from tinychatengine_tpu.core.config import (GenerationConfig, ModelConfig,
                                            QuantConfig)
from tinychatengine_tpu.generation.engine import Engine
from tinychatengine_tpu.models import llama
from tinychatengine_tpu.runtime.server import (InferenceServer, RequestError,
                                               build_gcfg, render_messages)
from tinychatengine_tpu.runtime.serving import ServingEngine
from tinychatengine_tpu.tokenizers.byte_fallback import ByteTokenizer
from tinychatengine_tpu.generation.chat_templates import (ChatTemplate,
                                                          template_for)

# short wraps so chat prompts fit the tiny model's 128-token context
# (the real vicuna preamble alone exceeds it)
TPL = ChatTemplate(first="S: {input}\nA: ", next="H: {input}\nA: ")


def _tiny():
    # vocab 384 >= ByteTokenizer's 258 ids (bos 256 / eos 257); pad ids
    # decode to "" so they are harmless in text comparisons
    cfg = ModelConfig(
        name="tiny", family="llama", num_heads=4, num_kv_heads=2,
        num_layers=2, max_sqlen=128, embed_dim=128, hidden_dim=256,
        vocab_size=384, rms_norm_eps=1e-5)
    qcfg = QuantConfig(scheme="fp")
    params = llama.init_random_params(cfg, qcfg, seed=0)
    return cfg, qcfg, params


@pytest.fixture(scope="module")
def served():
    cfg, qcfg, params = _tiny()
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    engine = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g)
    server = InferenceServer(engine, ByteTokenizer(), model_name="tiny",
                             template=TPL, request_timeout=120.0)
    port = server.start(port=0)
    yield server, port, (cfg, qcfg, params), g
    server.close()


def _post(port, path, body, timeout=120.0):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, json.dumps(body),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, json.loads(data)


def _get(port, path):
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30.0)
    conn.request("GET", path)
    resp = conn.getresponse()
    data = json.loads(resp.read())
    conn.close()
    return resp.status, data


def _sse_events(port, path, body, timeout=120.0):
    """POST with stream=true; returns the list of decoded SSE data payloads
    (dicts), asserting the stream terminates with [DONE]."""
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=timeout)
    conn.request("POST", path, json.dumps({**body, "stream": True}),
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type") == "text/event-stream"
    raw = resp.read().decode()
    conn.close()
    events = []
    saw_done = False
    for line in raw.split("\n\n"):
        line = line.strip()
        if not line:
            continue
        assert line.startswith("data: "), line
        payload = line[len("data: "):]
        if payload == "[DONE]":
            saw_done = True
        else:
            assert not saw_done, "payload after [DONE]"
            events.append(json.loads(payload))
    assert saw_done, "stream did not terminate with [DONE]"
    return events


def _solo_text(model, g, prompt_ids, n_predict):
    cfg, qcfg, params = model
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    g = GenerationConfig(**{**g.__dict__, "n_predict": n_predict})
    toks = eng.generate(np.asarray(prompt_ids, np.int32)[None, :], g).tokens[0]
    return ByteTokenizer().decode(toks), list(toks)


def test_health_and_models(served):
    _, port, _, _ = served
    st, h = _get(port, "/health")
    assert st == 200 and h["status"] == "ok" and h["slots"] == 2
    st, m = _get(port, "/v1/models")
    assert st == 200 and m["data"][0]["id"] == "tiny"
    st, _ = _get(port, "/nope")
    assert st == 404


def test_completion_matches_solo_engine(served):
    _, port, model, g = served
    prompt = "hello"
    ids = ByteTokenizer().encode(prompt, bos=True)
    want_text, want_toks = _solo_text(model, g, ids, 8)
    st, out = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 8, "ignore_eos": True})
    assert st == 200, out
    assert out["object"] == "text_completion"
    c = out["choices"][0]
    assert c["text"] == want_text
    assert c["finish_reason"] == "length"
    assert out["usage"] == {"prompt_tokens": len(ids),
                            "completion_tokens": len(want_toks),
                            "total_tokens": len(ids) + len(want_toks)}


def test_completion_pretokenized_prompt(served):
    _, port, model, g = served
    ids = [256, 104, 105]  # bos + "hi"
    want_text, _ = _solo_text(model, g, ids, 6)
    st, out = _post(port, "/v1/completions", {
        "prompt": ids, "max_tokens": 6, "ignore_eos": True})
    assert st == 200 and out["choices"][0]["text"] == want_text


def test_chat_completion_wraps_template(served):
    _, port, model, g = served
    text = render_messages(TPL, [{"role": "user", "content": "hi"}])
    ids = ByteTokenizer().encode(text, bos=True)
    want_text, _ = _solo_text(model, g, ids, 8)
    st, out = _post(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 8, "ignore_eos": True})
    assert st == 200, out
    assert out["object"] == "chat.completion"
    msg = out["choices"][0]["message"]
    assert msg["role"] == "assistant" and msg["content"] == want_text


def test_streaming_sse_matches_nonstream(served):
    _, port, _, _ = served
    body = {"prompt": "stream me", "max_tokens": 8, "ignore_eos": True}
    _, want = _post(port, "/v1/completions", body)
    events = _sse_events(port, "/v1/completions", body)
    assert all(e["object"] == "text_completion.chunk" for e in events)
    text = "".join(e["choices"][0]["text"] for e in events)
    assert text == want["choices"][0]["text"]
    assert events[-1]["choices"][0]["finish_reason"] == "length"
    assert all(e["choices"][0]["finish_reason"] is None for e in events[:-1])


def test_streaming_chat_deltas(served):
    _, port, _, _ = served
    body = {"messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 6, "ignore_eos": True}
    _, want = _post(port, "/v1/chat/completions", body)
    events = _sse_events(port, "/v1/chat/completions", body)
    assert events[0]["choices"][0]["delta"] == {"role": "assistant"}
    text = "".join(e["choices"][0]["delta"].get("content", "")
                   for e in events[1:])
    assert text == want["choices"][0]["message"]["content"]


def test_stop_string_truncates_and_frees_slot(served):
    server, port, model, g = served
    prompt = "stop test"
    ids = ByteTokenizer().encode(prompt, bos=True)
    full, _ = _solo_text(model, g, ids, 16)
    # choose a stop string that actually occurs mid-output
    printable = [ch for ch in full if ch.isprintable() and ch != " "]
    if len(set(full)) < 2 or len(printable) < 1:
        pytest.skip("random model produced no usable stop char")
    stop = printable[len(printable) // 2]
    head = full[:full.index(stop)]
    st, out = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 16, "ignore_eos": True,
        "stop": stop})
    assert st == 200, out
    c = out["choices"][0]
    assert c["finish_reason"] == "stop"
    assert c["text"] == head
    assert stop not in c["text"]
    # the cancel must actually free the engine slot (no zombie decode)
    deadline = 50
    while server.engine.n_active and deadline:
        import time
        time.sleep(0.1)
        deadline -= 1
    assert server.engine.n_active == 0


@pytest.mark.slow
def test_concurrent_clients_match_solo(served):
    _, port, model, g = served
    prompts = ["alpha", "bravo bravo", "c", "delta prompt four"]
    want = [_solo_text(model, g, ByteTokenizer().encode(p, bos=True), 8)[0]
            for p in prompts]
    results = [None] * len(prompts)

    def worker(i):
        st, out = _post(port, "/v1/completions", {
            "prompt": prompts[i], "max_tokens": 8, "ignore_eos": True})
        results[i] = (st, out["choices"][0]["text"])

    ts = [threading.Thread(target=worker, args=(i,))
          for i in range(len(prompts))]
    for t in ts:
        t.start()
    for t in ts:
        t.join(timeout=120)
    for i, (st, text) in enumerate(results):
        assert st == 200 and text == want[i], (i, results[i], want[i])


@pytest.mark.slow
def test_per_request_sampling_params(served):
    """Seeded sampling through the HTTP layer is reproducible, and distinct
    seeds diverge (pins the per-row sampler wiring end-to-end)."""
    _, port, _, _ = served
    body = {"prompt": "sample", "max_tokens": 8, "ignore_eos": True,
            "temperature": 1.0, "top_k": 0, "top_p": 1.0, "seed": 7}
    _, a = _post(port, "/v1/completions", body)
    _, b = _post(port, "/v1/completions", body)
    assert a["choices"][0]["text"] == b["choices"][0]["text"]
    _, c = _post(port, "/v1/completions", {**body, "seed": 8})
    # 8 tokens of temp-1 sampling: equality with a different seed is ~0
    assert c["choices"][0]["text"] != a["choices"][0]["text"]


def test_bad_requests_are_400s(served):
    _, port, _, _ = served
    cases = [
        ("/v1/completions", {"prompt": []}),                    # empty prompt
        ("/v1/completions", {"prompt": "x", "n": 0}),           # bad n
        ("/v1/completions", {"prompt": "x", "max_tokens": 0}),  # bad budget
        ("/v1/completions", {"prompt": "x", "stop": 5}),        # bad stop
        ("/v1/completions", {"prompt": "x", "temperature": "hot"}),
        ("/v1/completions", {"prompt": "x" * 4096}),            # too long
        ("/v1/completions", {"prompt": {"a": 1}}),              # bad type
        ("/v1/chat/completions", {"messages": []}),
        ("/v1/chat/completions", {"messages": [{"role": "tool",
                                                "content": "x"}]}),
        ("/v1/chat/completions", {"messages": [{"role": "system",
                                                "content": "only sys"}]}),
    ]
    for path, body in cases:
        st, out = _post(port, path, body)
        assert st == 400, (path, body, st, out)
        assert "error" in out
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30.0)
    conn.request("POST", "/v1/completions", "{not json",
                 {"Content-Type": "application/json"})
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_build_gcfg_returns_none_for_defaults(served):
    server, _, _, _ = served
    assert build_gcfg(server, {"prompt": "x", "max_tokens": 4}) is None
    g = build_gcfg(server, {"temperature": 0.5})
    assert g is not None and g.temp == 0.5
    with pytest.raises(RequestError):
        build_gcfg(server, {"temperature": -3.0})
    with pytest.raises(RequestError):
        build_gcfg(server, {"logit_bias": {"x": "y"}})


def test_render_messages_multiturn():
    tpl = template_for("tiny")
    text = render_messages(tpl, [
        {"role": "system", "content": "SYS"},
        {"role": "user", "content": "u1"},
        {"role": "assistant", "content": "a1"},
        {"role": "user", "content": [{"type": "text", "text": "u2"}]},
    ])
    assert text.startswith("SYS\n\n")
    assert tpl.first.replace("{image}", "").replace("{input}", "u1") in text
    assert "a1\n" in text
    assert tpl.next.replace("{image}", "").replace("{input}", "u2") in text
    with pytest.raises(RequestError):
        render_messages(tpl, [{"role": "assistant", "content": "no user"}])


def test_client_disconnect_mid_stream_cancels(served):
    """Closing the socket mid-SSE must propagate BrokenPipe → engine cancel:
    the slot frees without decoding to max_tokens (client-disconnect is the
    whole reason ServingEngine.cancel exists)."""
    import socket
    import time as _time
    server, port, _, _ = served
    body = json.dumps({"prompt": "disconnect me", "max_tokens": 96,
                       "ignore_eos": True, "stream": True})
    s = socket.create_connection(("127.0.0.1", port), timeout=60)
    s.sendall((f"POST /v1/completions HTTP/1.1\r\nHost: x\r\n"
               f"Content-Type: application/json\r\n"
               f"Content-Length: {len(body)}\r\n\r\n{body}").encode())
    # read until the first token chunk arrives, then vanish
    buf = b""
    while b"text_completion.chunk" not in buf:
        chunk = s.recv(4096)
        assert chunk, "server closed early"
        buf += chunk
    s.close()
    deadline = _time.monotonic() + 60
    while _time.monotonic() < deadline:
        if server.engine.n_active == 0 and not server.engine.queue \
                and server.engine._pending is None:
            break
        _time.sleep(0.2)
    assert server.engine.n_active == 0, "slot not freed after disconnect"
    req = server.engine.done[-1]
    assert req.finish_reason == "cancelled"
    assert len(req.output_ids) < 96, "request ran to completion anyway"


def test_metrics_endpoint(served):
    """Prometheus exposition: counters advance with completed requests and
    parse as floats."""
    server, port, _, _ = served
    before = dict(server.stats["requests_total"])
    _post(port, "/v1/completions", {"prompt": "metrics", "max_tokens": 4,
                                    "ignore_eos": True})
    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/metrics")
    resp = conn.getresponse()
    assert resp.status == 200
    assert resp.getheader("Content-Type").startswith("text/plain")
    text = resp.read().decode()
    conn.close()
    metrics = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        name, val = line.rsplit(" ", 1)
        metrics[name] = float(val)  # every sample must parse
    assert metrics["tce_slots"] == 2
    assert metrics["tce_generation_tokens_total"] >= 4
    assert metrics['tce_requests_total{reason="length"}'] >= \
        before.get("length", 0) + 1
    assert metrics["tce_ttft_seconds_count"] >= 1
    assert metrics["tce_ttft_seconds_sum"] > 0


def test_completions_logprobs(served):
    """OpenAI completions logprobs shape: tokens/token_logprobs/top_logprobs/
    text_offset, aligned, raw-model log-probs <= 0, greedy chosen == top-1."""
    server, port, _, _ = served
    status, body = _post(port, "/v1/completions", {
        "prompt": "ab", "max_tokens": 4, "ignore_eos": True, "logprobs": 2})
    assert status == 200
    lp = body["choices"][0]["logprobs"]
    n = len(lp["tokens"])
    assert n == len(lp["token_logprobs"]) == len(lp["top_logprobs"]) \
        == len(lp["text_offset"]) == 4
    assert lp["text_offset"][0] == 0
    assert all(isinstance(v, float) and v <= 1e-6
               for v in lp["token_logprobs"])
    for chosen_lp, top in zip(lp["token_logprobs"], lp["top_logprobs"]):
        # <= k: distinct ids can decode to the same string (byte fallback)
        assert 1 <= len(top) <= 2
        assert abs(max(top.values()) - chosen_lp) < 1e-5  # greedy == argmax


def test_chat_logprobs_and_stream_rejection(served):
    server, port, _, _ = served
    status, body = _post(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": "hey"}],
        "max_tokens": 3, "ignore_eos": True,
        "logprobs": True, "top_logprobs": 2})
    assert status == 200
    content = body["choices"][0]["logprobs"]["content"]
    assert len(content) == 3
    for entry in content:
        assert set(entry) == {"token", "logprob", "bytes", "top_logprobs"}
        assert len(entry["top_logprobs"]) == 2
        assert entry["logprob"] <= 1e-6
        assert isinstance(entry["bytes"], list)

    status, body = _post(port, "/v1/completions", {
        "prompt": "x", "max_tokens": 2, "stream": True, "logprobs": 1})
    assert status == 400
    assert "stream" in body["error"]["message"]

    status, body = _post(port, "/v1/completions", {
        "prompt": "x", "max_tokens": 2, "logprobs": 99})
    assert status == 400


def test_embeddings_endpoint(served):
    """Mean-pooled normalized embeddings: unit norm, deterministic, distinct
    inputs differ, batch of strings handled, usage counted."""
    server, port, _, _ = served
    status, body = _post(port, "/v1/embeddings",
                         {"input": ["hello world", "completely different"]})
    assert status == 200
    data = body["data"]
    assert [d["index"] for d in data] == [0, 1]
    e0, e1 = (np.asarray(d["embedding"], np.float32) for d in data)
    assert abs(float(np.linalg.norm(e0)) - 1.0) < 1e-3
    assert abs(float(np.linalg.norm(e1)) - 1.0) < 1e-3
    assert float(np.abs(e0 - e1).max()) > 1e-4  # different inputs differ
    assert body["usage"]["prompt_tokens"] > 0

    status2, body2 = _post(port, "/v1/embeddings", {"input": "hello world"})
    assert status2 == 200
    e0b = np.asarray(body2["data"][0]["embedding"], np.float32)
    assert float(np.abs(e0 - e0b).max()) < 1e-5  # deterministic

    status3, body3 = _post(port, "/v1/embeddings", {"input": []})
    assert status3 == 400


@pytest.mark.slow
def test_logprobs_align_with_stop_truncated_text(served):
    """A stop-string cut truncates the response text mid-stream; the
    logprobs arrays must describe exactly the returned text (no suppressed
    tokens, no text_offset past the end)."""
    server, port, model, g = served
    prompt = "stop lp"
    ids = ByteTokenizer().encode(prompt, bos=True)
    full, _ = _solo_text(model, g, ids, 16)
    printable = [ch for ch in full if ch.isprintable() and ch != " "]
    if len(set(full)) < 2 or len(printable) < 1:
        pytest.skip("random model produced no usable stop char")
    stop = printable[len(printable) // 2]
    st, out = _post(port, "/v1/completions", {
        "prompt": prompt, "max_tokens": 16, "ignore_eos": True,
        "stop": stop, "logprobs": 1})
    assert st == 200, out
    c = out["choices"][0]
    assert c["finish_reason"] == "stop"
    lp = c["logprobs"]
    assert "".join(lp["tokens"]) == c["text"]
    assert len(lp["tokens"]) == len(lp["token_logprobs"]) \
        == len(lp["text_offset"])
    for off, piece in zip(lp["text_offset"], lp["tokens"]):
        assert c["text"][off:off + len(piece)] == piece


def test_n_choices(served):
    """n>1: choices indexed 0..n-1, run concurrently through the batch;
    greedy choices are identical; sampled choices with an explicit seed
    differ (seed offset per choice); usage sums completion tokens."""
    server, port, _, _ = served
    st, out = _post(port, "/v1/completions", {
        "prompt": "multi", "max_tokens": 6, "ignore_eos": True, "n": 2})
    assert st == 200, out
    assert [c["index"] for c in out["choices"]] == [0, 1]
    assert out["choices"][0]["text"] == out["choices"][1]["text"]  # greedy
    assert out["usage"]["completion_tokens"] == 12

    st, out = _post(port, "/v1/completions", {
        "prompt": "multi", "max_tokens": 8, "ignore_eos": True, "n": 3,
        "temperature": 1.2, "seed": 7, "top_k": 0,
        "repetition_penalty": 1.0, "repeat_last_n": 1})
    assert st == 200, out
    texts = [c["text"] for c in out["choices"]]
    assert len(texts) == 3
    assert len(set(texts)) >= 2, f"seeded choices all identical: {texts!r}"

    st, out = _post(port, "/v1/completions", {
        "prompt": "x", "max_tokens": 2, "n": 2, "stream": True})
    assert st == 400
    st, out = _post(port, "/v1/completions", {
        "prompt": "x", "max_tokens": 2, "n": 0})
    assert st == 400
    st, out = _post(port, "/v1/completions", {
        "prompt": "x", "max_tokens": 2, "best_of": 3})
    assert st == 400


# ---- vision (image_url content parts) -----------------------------------------

def _png_data_url(seed=0, size=30):
    import base64
    import io

    from PIL import Image
    rng = np.random.default_rng(seed)
    img = Image.fromarray(
        rng.integers(0, 256, (size, size, 3), dtype=np.uint8))
    buf = io.BytesIO()
    img.save(buf, format="PNG")
    return ("data:image/png;base64,"
            + base64.b64encode(buf.getvalue()).decode())


@pytest.fixture(scope="module")
def served_vlm():
    from tinychatengine_tpu.models import clip
    cfg, qcfg, params = _tiny()
    ccfg = ModelConfig(
        name="clip_tiny", family="clip", num_heads=4, num_kv_heads=4,
        num_layers=2, max_sqlen=0, embed_dim=64, hidden_dim=128,
        vocab_size=0, image_size=28, patch_size=14,
        mmproj_dim=cfg.embed_dim)
    cparams = clip.init_random_params(ccfg)
    g = GenerationConfig(temp=0.0, n_predict=8, repeat_penalty=1.0,
                         repeat_last_n=1)
    engine = ServingEngine(params, cfg, qcfg, slots=2, gcfg=g)
    server = InferenceServer(engine, ByteTokenizer(), model_name="tiny-vlm",
                             template=TPL, request_timeout=120.0,
                             clip_params=cparams, clip_cfg=ccfg)
    port = server.start(port=0)
    yield server, port, (cfg, qcfg, params), (cparams, ccfg), g
    server.close()


@pytest.mark.slow
def test_chat_image_url_matches_engine_vlm(served_vlm):
    """An OpenAI image_url chat request returns exactly what the library VLM
    path (encode + splice + solo Engine) produces for the same image."""
    from tinychatengine_tpu.generation import vlm
    _, port, model, clip_ctx, g = served_vlm
    cfg, qcfg, params = model
    cparams, ccfg = clip_ctx
    url = _png_data_url(seed=3)

    st, out = _post(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": url}},
            {"type": "text", "text": "what is this?"},
        ]}],
        "max_tokens": 8, "ignore_eos": True})
    assert st == 200, out
    got = out["choices"][0]["message"]["content"]

    # oracle: same render (marker inline), same encode, solo engine
    from tinychatengine_tpu.runtime.server import _decode_image_data_url
    img = _decode_image_data_url(url)
    emb_img = vlm.encode_image(cparams, ccfg, img)
    prompt_text = TPL.first.replace("{image}", "").replace(
        "{input}", vlm.IMAGE_MARKER + "what is this?")
    ids, emb = vlm.build_multimodal_inputs_multi(
        ByteTokenizer(), params.embed, prompt_text, [emb_img])
    assert out["usage"]["prompt_tokens"] == len(ids)
    eng = Engine(params, cfg, qcfg, batch=1, max_len=cfg.max_sqlen)
    gg = GenerationConfig(**{**g.__dict__, "n_predict": 8})
    toks = eng.generate(ids[None], gg,
                        input_embeds=jnp.asarray(emb, jnp.bfloat16)[None]
                        ).tokens[0]
    assert got == ByteTokenizer().decode(toks)

    # and the image must matter: a different image changes the output
    st2, out2 = _post(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": _png_data_url(9)}},
            {"type": "text", "text": "what is this?"},
        ]}],
        "max_tokens": 8, "ignore_eos": True})
    assert st2 == 200
    assert out2["choices"][0]["message"]["content"] != got


def test_chat_image_streaming_and_two_images(served_vlm):
    _, port, *_ = served_vlm
    events = _sse_events(port, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "text", "text": "compare "},
            {"type": "image_url", "image_url": {"url": _png_data_url(1)}},
            {"type": "text", "text": " and "},
            {"type": "image_url", "image_url": {"url": _png_data_url(2)}},
        ]}],
        "max_tokens": 6, "ignore_eos": True})
    assert events[-1]["choices"][0]["finish_reason"] == "length"


def test_chat_image_validation(served_vlm, served):
    _, port_vlm, *_ = served_vlm
    msg = [{"role": "user", "content": [
        {"type": "image_url", "image_url": {"url": "https://x.test/a.png"}},
        {"type": "text", "text": "hi"}]}]
    st, out = _post(port_vlm, "/v1/chat/completions",
                    {"messages": msg, "max_tokens": 4})
    assert st == 400 and "data:" in out["error"]["message"]
    st, out = _post(port_vlm, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "image_url",
             "image_url": {"url": "data:image/png;base64,!!!"}},
        ]}], "max_tokens": 4})
    assert st == 400 and "decode" in out["error"]["message"]
    # a server built without a vision encoder refuses image parts
    _, port_txt, _, _ = served
    st, out = _post(port_txt, "/v1/chat/completions", {
        "messages": [{"role": "user", "content": [
            {"type": "image_url", "image_url": {"url": _png_data_url()}},
            {"type": "text", "text": "hi"}]}], "max_tokens": 4})
    assert st == 400 and "not enabled" in out["error"]["message"]


def test_image_caps_reject_oversize():
    """Decompression-bomb guards (ADVICE r4): oversized base64 payloads and
    oversized pixel dimensions are rejected BEFORE the full pixel decode."""
    import base64
    import io

    from PIL import Image

    from tinychatengine_tpu.runtime import server as srv_mod
    from tinychatengine_tpu.runtime.server import (RequestError,
                                                   _decode_image_data_url)

    # payload-size cap (no decode at all)
    big = "data:image/png;base64," + "A" * (srv_mod.MAX_IMAGE_B64_BYTES + 8)
    with pytest.raises(RequestError, match="payload too large"):
        _decode_image_data_url(big)

    # dimension cap: a tiny compressed PNG with huge pixel dims; the header
    # check must fire without materializing the pixels
    old = srv_mod.MAX_IMAGE_DIM
    srv_mod.MAX_IMAGE_DIM = 64
    try:
        img = Image.new("RGB", (128, 16))
        buf = io.BytesIO()
        img.save(buf, format="PNG")
        url = ("data:image/png;base64,"
               + base64.b64encode(buf.getvalue()).decode())
        with pytest.raises(RequestError, match="image too large"):
            _decode_image_data_url(url)
    finally:
        srv_mod.MAX_IMAGE_DIM = old

    # a normal small image still decodes
    arr = _decode_image_data_url(_png_data_url(seed=1, size=20))
    assert arr.shape == (20, 20, 3)


def test_serve_cli_tick_batch_plumbing():
    """The serve CLI's --tick-batch flag reaches the engine (r5: 64 measured
    best on the 24-req bench; the flag is the documented throughput knob)."""
    from tinychatengine_tpu.serve import build_demo_serving, build_parser

    args = build_parser().parse_args(["--demo"])
    assert args.tick_batch == 16  # serve default (engine ctor default is 8)
    args = build_parser().parse_args(["--demo", "--tick-batch", "64"])
    assert args.tick_batch == 64

    engine, tok = build_demo_serving(slots=2, tick_batch=4)
    assert engine.tick_batch == 4
