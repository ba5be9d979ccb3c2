"""HTTP serving front-end over the continuous-batching engine.

The production serving layer this framework adds on top of the reference's
interactive CLI (the reference's only "serving" surface is the single-stream
`main` loop, `examples/main/main.cpp:244-457`, and the Vulkan driver's
one-prompt `main`, `vulkan/llama-vk.cpp:2576-2635`). Stdlib-only (no web
framework): a `ThreadingHTTPServer` handles connections while ONE dedicated
engine thread owns the `BatchedEngine` — all device work stays on that
thread; HTTP handler threads communicate with it through thread-safe queues.

Endpoints:
  GET  /health          liveness + model info
  GET  /v1/models       OpenAI-style model listing
  GET  /metrics         Prometheus text-format counters
  GET  /stats           raw engine stats (JSON)
  POST /v1/completions  OpenAI-style text completion; `"stream": true`
                        streams server-sent events (one JSON chunk per text
                        delta, then `data: [DONE]`)
  POST /v1/prefixes     register a shared prompt prefix once (prefix
                        caching / shared-prefix pool / paged prefix-page
                        sharing, per the engine's BatchConfig); requests
                        then pass `"prefix_id": <id>`

Request body (POST /v1/completions):
  prompt: str | [int]     text (tokenized server-side) or raw token ids
  max_tokens: int = 64
  temperature: float = 0.8,  top_p: float = 0.95,  top_k: int = 40
  repeat_penalty: float = 1.1,  seed: int = 0
  stop: [str] = []        cut generation at any of these strings (the
                          antiprompt of main.cpp:348-366, server-side)
  stream: bool = false
  ignore_eos: bool = false
  echo: bool = false      prepend the prompt text to the completion
  prefix_id: int = -1     continue a registered shared prefix

Streaming emits only COMPLETE UTF-8: byte-fallback tokens can split a
multi-byte character across tokens, so the encoder holds back trailing
partial sequences (and the longest stop-string prefix) until resolved.
"""

from __future__ import annotations

import json
import queue
import threading
import time
import uuid
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from ..models.llama import ModelConfig
from .batching import BatchConfig, BatchedEngine, Request
from .sampling import SamplerParams


def _utf8_complete_len(b: bytes) -> int:
    """Length of the longest prefix of `b` that is complete UTF-8 (a
    trailing partial multi-byte sequence is held back)."""
    n = len(b)
    i = n - 1
    # scan back over up to 3 continuation bytes
    back = 0
    while i >= 0 and back < 3 and (b[i] & 0xC0) == 0x80:
        i -= 1
        back += 1
    if i < 0:
        return 0 if back else n
    lead = b[i]
    if lead < 0x80:
        need = 1
    elif lead >= 0xF0:
        need = 4
    elif lead >= 0xE0:
        need = 3
    elif lead >= 0xC0:
        need = 2
    else:  # stray continuation byte: pass through
        return n
    have = 1 + back
    return n if have >= need else i


class _Stream:
    """Per-request bridge between the engine thread and an HTTP handler.

    The token queue is created BEFORE the request is submitted and rides in
    as the engine's on_token callback, so the admission-time first token is
    delivered through the same path as every other (no replay races)."""

    def __init__(self):
        self.req: Request | None = None
        self.q: queue.Queue = queue.Queue()

    def cancel(self):
        # engine thread checks req.done at every emit and frees the slot at
        # the end of the current block
        if self.req is not None:
            self.req.done = True


class _Replica:
    """One model replica: a BatchedEngine owned by one engine thread, fed
    through a thread-safe pending list. N of these behind one HTTP front
    door = multi-replica serving (each replica owns its own device group —
    its own weight copy, KV, and dispatch stream)."""

    def __init__(self, idx: int, cfg, params, bcfg, mesh=None, device=None):
        import jax

        if device is not None and mesh is None:
            # single-device replica: commit this replica's weight copy to
            # its device; the engine's uncommitted buffers follow it
            params = jax.device_put(params, device)
        self.idx = idx
        self.engine = BatchedEngine(cfg, params, bcfg, mesh=mesh)
        self.pending: list[tuple] = []  # (kind, payload, reply queue)
        self.cv = threading.Condition()
        self.running = False
        self.thread: threading.Thread | None = None

    @property
    def load(self) -> int:
        # read WITHOUT the replica's cv lock: queue/slots mutate on the
        # engine thread, so values can be momentarily stale — least-loaded
        # placement is deliberately best-effort (a lock here would serialize
        # every HTTP submit against the engine loop for no accuracy payoff)
        eng = self.engine
        return len(eng.queue) + sum(r is not None for r in eng.slots)

    def loop(self):
        eng = self.engine
        while True:
            with self.cv:
                while (
                    self.running
                    and not self.pending
                    and not eng.queue
                    and not any(eng.slots)
                ):
                    self.cv.wait(timeout=0.5)
                if not self.running:
                    return
                pending, self.pending = self.pending, []
            for kind, payload, reply in pending:
                try:
                    if kind == "submit":
                        stream = payload.pop("_stream")
                        req = eng.submit(**payload)
                        # attach HERE (engine thread) so the finished-request
                        # sentinel below can never miss a just-submitted req
                        stream.req = req
                        req._stream = stream
                        reply.put(req)
                    elif kind == "prefix":
                        reply.put(eng.register_prefix(payload))
                except Exception as e:  # surface to the HTTP thread
                    reply.put(e)
            if eng.queue or any(eng.slots):
                finished = eng.step()
                for req in finished:
                    stream = getattr(req, "_stream", None)
                    if stream is not None:
                        stream.q.put(None)  # end-of-stream sentinel

    def post(self, kind: str, payload) -> queue.Queue:
        reply: queue.Queue = queue.Queue()
        with self.cv:
            self.pending.append((kind, payload, reply))
            self.cv.notify()
        return reply

    def start(self):
        self.running = True
        self.thread = threading.Thread(target=self.loop, daemon=True)
        self.thread.start()

    def stop(self):
        with self.cv:
            self.running = False
            self.cv.notify()
        if self.thread is not None:
            self.thread.join(timeout=30)


class LlamaServer:
    """Serving runtime: N replica engine threads + an HTTP front door.

    replicas > 1 partitions the devices into `replicas` groups of
    tp x dp devices each (ROADMAP #6 / VERDICT r3 #4): every replica holds
    its own weight copy and KV and decodes independently; admission is
    least-loaded (per-replica queued + active slots). A registered prefix
    registers on EVERY replica so `prefix_id` is valid wherever a request
    lands."""

    def __init__(self, cfg: ModelConfig, params, tokenizer,
                 bcfg: BatchConfig = BatchConfig(),
                 model_name: str | None = None, mesh=None,
                 replicas: int = 1, devices=None):
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.model_name = model_name or f"llama-{cfg.type_name}"
        self.bcfg = bcfg
        if replicas <= 1:
            self.replicas = [_Replica(0, cfg, params, bcfg, mesh=mesh)]
        else:
            import jax

            assert mesh is None, (
                "pass replicas= with per-replica group sizes via tp/dp in "
                "make_replica_meshes, not a prebuilt mesh"
            )
            devices = list(devices if devices is not None else jax.devices())
            assert len(devices) >= replicas, (
                f"{replicas} replicas need >= {replicas} devices, "
                f"have {len(devices)}"
            )
            per = len(devices) // replicas
            self.replicas = []
            for i in range(replicas):
                group = devices[i * per : (i + 1) * per]
                if per == 1:
                    rep = _Replica(i, cfg, params, bcfg, device=group[0])
                else:
                    from ..parallel import make_mesh

                    rep = _Replica(
                        i, cfg, params, bcfg,
                        mesh=make_mesh(tp=per, dp=1, devices=group),
                    )
                self.replicas.append(rep)
        self.engine = self.replicas[0].engine  # single-replica back-compat
        self._rr = 0
        # serializes register_prefix's (post-to-all, collect-all) sequence:
        # concurrent registrations would otherwise be processed in different
        # orders by different replicas and the per-replica ids diverge
        self._prefix_lock = threading.Lock()
        self._httpd: ThreadingHTTPServer | None = None
        self.t_start = time.time()
        self.n_requests = 0
        self.n_stream = 0

    # --- request routing ----------------------------------------------------

    def _pick(self) -> _Replica:
        """Least-loaded replica; round-robin among ties."""
        self._rr += 1
        return min(
            self.replicas,
            key=lambda r: (r.load, (r.idx - self._rr) % len(self.replicas)),
        )

    def submit(self, prompt_ids, n_predict, sp: SamplerParams, seed=0,
               ignore_eos=False, prefix=-1) -> _Stream:
        stream = _Stream()
        payload = dict(prompt=prompt_ids, n_predict=n_predict, sp=sp,
                       seed=seed, ignore_eos=ignore_eos, prefix=prefix,
                       on_token=stream.q.put, _stream=stream)
        req = self._pick().post("submit", payload).get()
        if isinstance(req, Exception):
            raise req
        return stream

    def register_prefix(self, tokens: list[int]) -> int:
        """Register on every replica; ids advance in lockstep (each replica
        starts at 0 and sees the same registration sequence — the lock makes
        the whole post-to-all/collect-all sequence atomic across concurrent
        HTTP callers, so no replica can interleave two registrations)."""
        with self._prefix_lock:
            replies = [r.post("prefix", tokens) for r in self.replicas]
            outs = [q.get() for q in replies]
        for out in outs:
            if isinstance(out, Exception):
                raise out
        if len(set(outs)) != 1:  # real error, not an assert (-O safe)
            raise RuntimeError(f"replica prefix ids diverged: {outs}")
        return outs[0]

    # --- lifecycle ----------------------------------------------------------

    def start(self, host: str = "127.0.0.1", port: int = 8000):
        for rep in self.replicas:
            rep.start()
        server = self

        class Handler(_Handler):
            srv = server

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        return self._httpd

    def serve_forever(self, host: str = "127.0.0.1", port: int = 8000):
        httpd = self.start(host, port)
        import sys

        print(f"llamavk serving {self.model_name} on http://{host}:{port}",
              file=sys.stderr)
        try:
            httpd.serve_forever()
        finally:
            self.shutdown()

    def shutdown(self):
        for rep in self.replicas:
            rep.stop()
        if self._httpd is not None:
            self._httpd.shutdown()
            self._httpd.server_close()

    # --- request handling (called from HTTP threads) ------------------------

    def completion_events(self, body: dict):
        """Parse + submit (errors raise HERE, before any bytes are sent),
        then return a generator of (delta_text, finish_reason|None)."""
        prompt = body.get("prompt", "")
        if isinstance(prompt, list):
            ids = [int(t) for t in prompt]
            prompt_text = self.tokenizer.decode(ids).decode("utf-8", "replace")
        else:
            bos = body.get("prefix_id", -1) < 0
            ids = self.tokenizer.encode(prompt, bos=bos)
            prompt_text = prompt
        sp = SamplerParams(
            top_k=int(body.get("top_k", 40)),
            top_p=float(body.get("top_p", 0.95)),
            temp=float(body.get("temperature", 0.8)),
            repeat_penalty=float(body.get("repeat_penalty", 1.1)),
        )
        max_tokens = int(body.get("max_tokens", 64))
        stream = self.submit(
            ids, max_tokens, sp, seed=int(body.get("seed", 0)),
            ignore_eos=bool(body.get("ignore_eos", False)),
            prefix=int(body.get("prefix_id", -1)),
        )
        self.n_requests += 1
        return self._event_gen(body, stream, prompt_text)

    def _event_gen(self, body: dict, stream: _Stream, prompt_text: str):
        stops = [s.encode() for s in body.get("stop", []) or []]
        max_stop = max((len(s) for s in stops), default=0)

        if body.get("echo"):
            yield prompt_text, None

        raw = b""  # all generated bytes
        sent = 0  # bytes already yielded
        finish = "length"
        try:
            while True:
                tok = stream.q.get()
                if tok is None:
                    break
                if tok == 2 and not body.get("ignore_eos", False):
                    finish = "stop"
                    # engine marks done; wait for the sentinel
                    continue
                raw += self.tokenizer.decode_token(tok)
                if stops:
                    cut = min(
                        (i for s in stops if (i := raw.find(s)) >= 0),
                        default=-1,
                    )
                    if cut >= 0:
                        finish = "stop"
                        stream.cancel()
                        raw = raw[:cut]
                        # drain to the sentinel so the slot frees cleanly
                        while stream.q.get() is not None:
                            pass
                        break
                # emit complete UTF-8, holding back a possible stop prefix
                emit_to = _utf8_complete_len(raw)
                if max_stop:
                    emit_to = min(emit_to, len(raw) - (max_stop - 1))
                if emit_to > sent:
                    yield raw[sent:emit_to].decode("utf-8", "replace"), None
                    sent = emit_to
        except GeneratorExit:
            # client went away mid-stream: stop generating for this slot
            stream.cancel()
            raise
        tail = raw[sent : _utf8_complete_len(raw)]
        yield tail.decode("utf-8", "replace"), finish

    def stats(self) -> dict:
        """Aggregate counters over replicas (+ a per-replica breakdown when
        there is more than one)."""
        s: dict = {}
        per = []
        for rep in self.replicas:
            es = dict(rep.engine.stats)
            es.update(
                active_slots=sum(r is not None for r in rep.engine.slots),
                queued=len(rep.engine.queue),
            )
            per.append(es)
            for k, v in es.items():
                if not isinstance(v, (int, float)):
                    continue
                # time counters tick concurrently across replicas, so their
                # cross-replica SUM is not wall time — publish them under an
                # explicit _sum name so tokens/t_decode-style math on the
                # aggregate can't silently understate throughput
                key = f"{k}_sum" if k.startswith("t_") and len(self.replicas) > 1 else k
                s[key] = s.get(key, 0) + v
        s.update(
            uptime_s=round(time.time() - self.t_start, 1),
            requests=self.n_requests,
            model=self.model_name,
            max_batch=self.bcfg.max_batch,
            replicas=len(self.replicas),
        )
        if any(e.get("t_decode") for e in per):
            # aggregate decode throughput: replicas decode concurrently, so
            # sum per-replica rates, never tokens over summed time
            s["decode_tok_s"] = round(
                sum(
                    (e["tokens"] / e["t_decode"]) if e.get("t_decode") else 0
                    for e in per
                ),
                1,
            )
        if len(per) > 1:
            s["per_replica"] = per
        return s


class _Handler(BaseHTTPRequestHandler):
    srv: LlamaServer = None  # bound by LlamaServer.start
    protocol_version = "HTTP/1.1"

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _json(self, code: int, obj: dict):
        data = json.dumps(obj).encode()
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path == "/health":
            return self._json(200, {"status": "ok", "model": self.srv.model_name})
        if self.path == "/v1/models":
            return self._json(200, {
                "object": "list",
                "data": [{"id": self.srv.model_name, "object": "model",
                          "owned_by": "llamavk_tpu"}],
            })
        if self.path == "/stats":
            return self._json(200, self.srv.stats())
        if self.path == "/metrics":
            s = self.srv.stats()
            lines = []
            for k in ("tokens", "steps", "prefills", "prefill_calls",
                      "requests", "active_slots", "queued", "preempted"):
                if k in s:
                    lines.append(f"llamavk_{k} {s[k]}")
            lines.append(f"llamavk_uptime_seconds {s['uptime_s']}")
            lines.append(f"llamavk_replicas {s.get('replicas', 1)}")
            if "decode_tok_s" in s:
                lines.append(f"llamavk_decode_tokens_per_second {s['decode_tok_s']}")
            for i, es in enumerate(s.get("per_replica", [])):
                for k in ("tokens", "active_slots", "queued", "preempted"):
                    if k in es:
                        lines.append(
                            f'llamavk_{k}{{replica="{i}"}} {es[k]}'
                        )
            data = ("\n".join(lines) + "\n").encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/plain; version=0.0.4")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
            return
        self._json(404, {"error": "not found"})

    def _read_body(self) -> dict:
        n = int(self.headers.get("Content-Length", 0))
        if n <= 0:
            return {}
        return json.loads(self.rfile.read(n) or b"{}")

    def do_POST(self):
        try:
            body = self._read_body()
        except Exception as e:
            return self._json(400, {"error": f"bad json: {e}"})
        if self.path == "/v1/prefixes":
            try:
                toks = body.get("tokens")
                if toks is None:
                    toks = self.srv.tokenizer.encode(body["prompt"], bos=True)
                pid = self.srv.register_prefix([int(t) for t in toks])
            except Exception as e:
                return self._json(400, {"error": str(e)})
            return self._json(200, {"prefix_id": pid, "n_tokens": len(toks)})
        if self.path != "/v1/completions":
            return self._json(404, {"error": "not found"})

        rid = f"cmpl-{uuid.uuid4().hex[:24]}"
        created = int(time.time())
        base = {"id": rid, "object": "text_completion", "created": created,
                "model": self.srv.model_name}
        try:
            events = self.srv.completion_events(body)
        except Exception as e:
            return self._json(400, {"error": str(e)})

        if body.get("stream"):
            self.srv.n_stream += 1
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()

            def chunk(data: bytes):
                self.wfile.write(f"{len(data):X}\r\n".encode() + data + b"\r\n")

            try:
                for text, finish in events:
                    if not text and finish is None:
                        continue
                    obj = dict(base, choices=[{
                        "text": text, "index": 0, "finish_reason": finish,
                    }])
                    chunk(b"data: " + json.dumps(obj).encode() + b"\n\n")
                chunk(b"data: [DONE]\n\n")
                chunk(b"")  # final chunk
            except (BrokenPipeError, ConnectionResetError):
                events.close()
            return

        parts, finish = [], "length"
        try:
            for text, fin in events:
                parts.append(text)
                if fin is not None:
                    finish = fin
        except Exception as e:
            return self._json(500, {"error": str(e)})
        self._json(200, dict(base, choices=[{
            "text": "".join(parts), "index": 0, "finish_reason": finish,
        }]))
