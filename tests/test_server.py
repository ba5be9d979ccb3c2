"""HTTP serving front-end: endpoints, streaming SSE, stop strings,
concurrency, prefix registration — on the tiny model over a real local
socket (stdlib http.server + urllib, no frameworks)."""

import json
import threading
import urllib.request

import pytest

from llamavk_tpu.models import load_model, random_tiny_model
from llamavk_tpu.runtime.batching import BatchConfig
from llamavk_tpu.runtime.server import LlamaServer, _utf8_complete_len


def test_utf8_holdback():
    s = "héllo ✓".encode()
    for cut in range(len(s) + 1):
        n = _utf8_complete_len(s[:cut])
        assert n <= cut
        s[:n].decode("utf-8")  # must never raise
    # pure ascii passes through whole
    assert _utf8_complete_len(b"abc") == 3
    # lone lead byte held back
    assert _utf8_complete_len("é".encode()[:1]) == 0


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("m") / "tiny-q4_0.bin")
    random_tiny_model(write_path=path, quantize=True)
    cfg, params, tok = load_model(path)
    srv = LlamaServer(
        cfg, params, tok,
        BatchConfig(max_batch=4, n_ctx=64, block=4),
        model_name="tiny-test",
    )
    httpd = srv.start("127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base
    srv.shutdown()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=120) as r:
        return r.status, r.read()


def _post(base, path, body):
    req = urllib.request.Request(
        base + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=600) as r:
        return r.status, r.read()


def _completion(base, **body):
    status, data = _post(base, "/v1/completions", body)
    assert status == 200
    return json.loads(data)


def test_health_models_metrics(server):
    status, data = _get(server, "/health")
    assert status == 200 and json.loads(data)["status"] == "ok"
    status, data = _get(server, "/v1/models")
    assert json.loads(data)["data"][0]["id"] == "tiny-test"
    status, data = _get(server, "/stats")
    assert json.loads(data)["model"] == "tiny-test"
    status, data = _get(server, "/metrics")
    assert status == 200 and b"llamavk_uptime_seconds" in data


def test_completion_greedy_deterministic(server):
    body = dict(prompt=[5, 9, 2, 30], max_tokens=6, temperature=0.0,
                ignore_eos=True)
    r1 = _completion(server, **body)
    r2 = _completion(server, **body)
    assert r1["object"] == "text_completion"
    text = r1["choices"][0]["text"]
    assert text == r2["choices"][0]["text"] and len(text) > 0
    assert r1["choices"][0]["finish_reason"] == "length"


def test_completion_echo_and_token_prompt(server):
    r = _completion(server, prompt=[5, 9], max_tokens=3, temperature=0.0,
                    ignore_eos=True, echo=True)
    assert r["choices"][0]["text"].startswith("<t5><t9>")


def test_streaming_matches_non_streaming(server):
    body = dict(prompt=[7, 3, 11], max_tokens=6, temperature=0.0,
                ignore_eos=True)
    want = _completion(server, **body)["choices"][0]["text"]

    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps(dict(body, stream=True)).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    chunks, finishes = [], []
    with urllib.request.urlopen(req, timeout=600) as r:
        assert r.headers["Content-Type"].startswith("text/event-stream")
        for raw in r:
            line = raw.decode().strip()
            if not line.startswith("data: "):
                continue
            payload = line[len("data: "):]
            if payload == "[DONE]":
                break
            obj = json.loads(payload)
            chunks.append(obj["choices"][0]["text"])
            finishes.append(obj["choices"][0]["finish_reason"])
    assert "".join(chunks) == want
    assert finishes[-1] == "length" and all(f is None for f in finishes[:-1])


def test_stop_string_cuts(server):
    body = dict(prompt=[5, 9, 2, 30], max_tokens=8, temperature=0.0,
                ignore_eos=True)
    full = _completion(server, **body)["choices"][0]["text"]
    # pick the 3rd generated piece as the stop marker
    pieces = full.replace(">", ">\x00").split("\x00")
    stop = pieces[2]
    r = _completion(server, **dict(body, stop=[stop]))
    got = r["choices"][0]["text"]
    assert got == full[: full.index(stop)]
    assert r["choices"][0]["finish_reason"] == "stop"


def test_concurrent_requests(server):
    bodies = [
        dict(prompt=[5, 9, 2, 30], max_tokens=5, temperature=0.0,
             ignore_eos=True),
        dict(prompt=[7, 3], max_tokens=5, temperature=0.0, ignore_eos=True),
        dict(prompt=[1, 2, 3], max_tokens=5, temperature=1.1, top_p=0.9,
             seed=7, ignore_eos=True),
    ]
    want = [_completion(server, **b)["choices"][0]["text"] for b in bodies]
    got = [None] * len(bodies)

    def run(i):
        got[i] = _completion(server, **bodies[i])["choices"][0]["text"]

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(bodies))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert got == want


def test_prefix_registration_and_use(server):
    status, data = _post(server, "/v1/prefixes",
                         {"tokens": list(range(3, 20))})
    assert status == 200
    pid = json.loads(data)["prefix_id"]
    r = _completion(server, prompt=[5, 9], max_tokens=4, temperature=0.0,
                    ignore_eos=True, prefix_id=pid)
    # oracle: same tokens as one flat prompt (prefix caching is exact)
    want = _completion(server, prompt=list(range(3, 20)) + [5, 9],
                       max_tokens=4, temperature=0.0, ignore_eos=True)
    assert r["choices"][0]["text"] == want["choices"][0]["text"]


def test_bad_requests(server):
    req = urllib.request.Request(
        server + "/v1/completions", data=b"not json",
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=120)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # over-long request rejected cleanly (engine assert surfaces as 400)
    req = urllib.request.Request(
        server + "/v1/completions",
        data=json.dumps({"prompt": [1] * 60, "max_tokens": 50}).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    try:
        urllib.request.urlopen(req, timeout=120)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400


@pytest.fixture(scope="module")
def replica_server(tmp_path_factory):
    """Two single-device replicas on the CPU mesh (VERDICT r3 #4)."""
    import jax

    path = str(tmp_path_factory.mktemp("m") / "tiny-q4_0.bin")
    random_tiny_model(write_path=path, quantize=True)
    cfg, params, tok = load_model(path)
    srv = LlamaServer(
        cfg, params, tok,
        BatchConfig(max_batch=2, n_ctx=64, block=4),
        model_name="tiny-2rep", replicas=2, devices=jax.devices()[:2],
    )
    httpd = srv.start("127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{httpd.server_address[1]}"
    yield base, srv
    srv.shutdown()


def test_replicas_concurrent_exact(replica_server):
    """Concurrent requests spread over 2 replicas; every stream must equal
    the same request served alone (replica placement cannot change output)."""
    base, srv = replica_server
    assert len(srv.replicas) == 2
    bodies = [
        dict(prompt=[5, 9, 2, 30], max_tokens=5, temperature=0.0,
             ignore_eos=True),
        dict(prompt=[7, 3], max_tokens=5, temperature=0.0, ignore_eos=True),
        dict(prompt=[1, 2, 3], max_tokens=5, temperature=1.1, top_p=0.9,
             seed=7, ignore_eos=True),
        dict(prompt=[42], max_tokens=4, temperature=0.0, ignore_eos=True),
    ]
    want = [_completion(base, **b)["choices"][0]["text"] for b in bodies]
    got = [None] * len(bodies)

    def run(i):
        got[i] = _completion(base, **bodies[i])["choices"][0]["text"]

    threads = [threading.Thread(target=run, args=(i,))
               for i in range(len(bodies))]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert got == want
    # both replicas actually decoded something across the test run
    s = srv.stats()
    assert s["replicas"] == 2
    per = s["per_replica"]
    assert len(per) == 2 and all(e["tokens"] > 0 for e in per), per


def test_replicas_prefix_registers_everywhere(replica_server):
    """A prefix registered through the front door must be usable no matter
    which replica a request lands on (ids advance in lockstep)."""
    base, srv = replica_server
    status, data = _post(base, "/v1/prefixes", {"tokens": list(range(3, 16))})
    assert status == 200
    pid = json.loads(data)["prefix_id"]
    want = _completion(base, prompt=list(range(3, 16)) + [5, 9],
                       max_tokens=4, temperature=0.0, ignore_eos=True)
    # run enough prefix requests that BOTH replicas serve at least one
    outs = []

    def run(i):
        outs.append(_completion(base, prompt=[5, 9], max_tokens=4,
                                temperature=0.0, ignore_eos=True,
                                prefix_id=pid)["choices"][0]["text"])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert all(o == want["choices"][0]["text"] for o in outs), outs

