"""Generation CLI — parity with examples/main (`examples/main/main.cpp`).

Features mirrored: prompt eval + streaming decode, sampling flags
(top-k/top-p/temp/repeat-penalty/repeat-last-n), --ignore-eos, --n-keep with
infinite-generation context swap (keep n_keep prompt tokens, re-feed half of
the recent window on overflow, main.cpp:246-266), interactive mode with
reverse-prompt (antiprompt) detection (main.cpp:348-366), instruct (Alpaca)
prefix/suffix injection (main.cpp:155-163,418-430), SIGINT interject — first
^C during interactive generation returns to the input prompt, second exits
130 (main.cpp:26-36,348-366) — ANSI --color (common.cpp:286-302), --mtest
memory probe (main.cpp:119-135), and --random-prompt (common.cpp:256-267).
"""

from __future__ import annotations

import argparse
import random
import signal
import sys
import time

import numpy as np

from ..models import load_model
from ..runtime import Engine, EngineConfig, SamplerParams
from ..tokenizer import BOS_ID, EOS_ID

INSTRUCT_PREFIX = "\n\n### Instruction:\n\n"
INSTRUCT_SUFFIX = "\n\n### Response:\n\n"

# ANSI colors (common.cpp:271-302): prompt echo yellow, user input bold
# green, generated text default
ANSI_RESET = "\x1b[0m"
ANSI_YELLOW = "\x1b[33m"
ANSI_BOLD_GREEN = "\x1b[1m\x1b[32m"

# the reference's starter pool for --random-prompt (common.cpp:256-267)
RANDOM_PROMPTS = [
    "So", "Once upon a time", "When", "The", "After", "If", "import",
    "He", "She", "They",
]


def build_argparser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-m", "--model", required=True)
    ap.add_argument("-p", "--prompt", default="")
    ap.add_argument("-f", "--file", help="read prompt from file")
    ap.add_argument("-n", "--n-predict", type=int, default=128)
    ap.add_argument("-c", "--ctx-size", type=int, default=512)
    ap.add_argument("-s", "--seed", type=int, default=-1)
    ap.add_argument("--top-k", type=int, default=40)
    ap.add_argument("--top-p", type=float, default=0.95)
    ap.add_argument("--temp", type=float, default=0.8)
    ap.add_argument("--repeat-penalty", type=float, default=1.10)
    ap.add_argument("--repeat-last-n", type=int, default=64)
    ap.add_argument("--ignore-eos", action="store_true")
    ap.add_argument("--n-keep", type=int, default=0)
    ap.add_argument(
        "--ctx-swap", choices=["reeval", "ring"], default="reeval",
        help="context-overflow strategy: reeval = keep n_keep + re-feed half "
        "the window (main.cpp:246-266 parity); ring = history-ring KV, no "
        "re-eval (the Vulkan engine's historyIndex, generalized)",
    )
    ap.add_argument(
        "--kv-dtype", choices=["bfloat16", "int8"], default="bfloat16",
        help="KV cache storage (int8: half the memory/bandwidth, 2x context)",
    )
    ap.add_argument(
        "--no-int4-weights", action="store_true",
        help="keep int8 byte-packed weight planes; by default TPU runs "
        "convert packed weights to int4-plane storage at load "
        "(~10%% faster decode, identical quantized values)",
    )
    ap.add_argument(
        "--draft-model", default=None,
        help="speculative decoding: a smaller checkpoint that drafts tokens "
        "the main model verifies (greedy only; output is identical to plain "
        "greedy decode, just faster)",
    )
    ap.add_argument(
        "--draft-n", type=int, default=4,
        help="draft tokens proposed per verify round (gamma)",
    )
    ap.add_argument(
        "--draft-lookup", action="store_true",
        help="speculative decoding WITHOUT a draft model: draft from the "
        "most recent matching 2-gram in the context (prompt-lookup). A round "
        "costs ~one decode step and emits 1..draft-n tokens, so this never "
        "loses; it wins on text that revisits its own n-grams (greedy only)",
    )
    ap.add_argument("-i", "--interactive", action="store_true")
    ap.add_argument("-r", "--reverse-prompt", action="append", default=[])
    ap.add_argument("-ins", "--instruct", action="store_true")
    ap.add_argument(
        "--color", action="store_true",
        help="ANSI colors: prompt yellow, user input green (common.cpp)",
    )
    ap.add_argument(
        "--mtest", action="store_true",
        help="memory probe: eval a full batch at n_past=0 and one token at "
        "n_past=n_predict-1, print timings, exit (main.cpp:119-135)",
    )
    ap.add_argument(
        "--random-prompt", action="store_true",
        help="start with a random short prompt when -p is empty",
    )
    ap.add_argument("-b", "--batch-size", type=int, default=8)
    ap.add_argument("--verbose", action="store_true")
    return ap


class ContextManager:
    """Infinite generation: when the context fills, keep the first n_keep
    tokens and re-feed the last half of the remaining window."""

    def __init__(self, engine: Engine, n_ctx: int, n_keep: int):
        self.engine = engine
        self.n_ctx = n_ctx
        self.n_keep = n_keep

    def ensure_room(self, needed: int) -> None:
        e = self.engine
        if e.n_past + needed <= self.n_ctx:
            return
        n_left = e.n_past - self.n_keep
        keep_tokens = e.tokens[: self.n_keep]
        refeed = e.tokens[max(self.n_keep, e.n_past - n_left // 2):]
        e.reset()
        if keep_tokens:
            e.eval(keep_tokens)
        if refeed:
            e.eval(refeed)
        e.tokens = list(keep_tokens) + list(refeed)


def run(args, stdin=sys.stdin, stdout=sys.stdout) -> int:
    t_load0 = time.perf_counter()
    import jax as _jax

    use_i4 = not args.no_int4_weights and _jax.default_backend() == "tpu"
    cfg, params, tok = load_model(args.model, int4_planes=use_i4)

    prompt = args.prompt
    if args.file:
        with open(args.file) as f:
            prompt = f.read()
    if not prompt and getattr(args, "random_prompt", False):
        rng = random.Random(args.seed if args.seed >= 0 else None)
        prompt = rng.choice(RANDOM_PROMPTS)
    # reference behavior: prepend a space to the prompt (main.cpp:138-141)
    prompt_tokens = tok.encode(" " + prompt, bos=True)
    # --n-keep -1 = keep the whole prompt (main.cpp:151-153)
    n_keep = args.n_keep if args.n_keep > 0 else len(prompt_tokens)

    ring = getattr(args, "ctx_swap", "reeval") == "ring"
    engine = Engine(
        cfg,
        params,
        EngineConfig(
            n_ctx=args.ctx_size,
            seed=args.seed if args.seed >= 0 else 0,
            kv_dtype=getattr(args, "kv_dtype", "bfloat16"),
            ctx_ring=ring,
            ring_keep=min(n_keep, args.ctx_size // 2) if ring else 0,
        ),
    )
    engine.timings.t_load_us = (time.perf_counter() - t_load0) * 1e6

    use_color = getattr(args, "color", False)

    def put(text: str, color: str | None = None) -> None:
        if use_color and color:
            stdout.write(color + text + ANSI_RESET)
        else:
            stdout.write(text)
        stdout.flush()

    if getattr(args, "mtest", False):
        # worst-case memory probe (main.cpp:119-135): largest prompt batch,
        # then a decode step at the deepest n_past
        engine.eval([0] * min(args.batch_size, args.ctx_size))
        engine.reset()
        engine.n_past = min(args.n_predict - 1, args.ctx_size - 1)
        engine.eval([0])
        print(engine.timings.report(), file=sys.stderr)
        return 0

    sp = SamplerParams(
        top_k=args.top_k,
        top_p=args.top_p,
        temp=args.temp,
        repeat_penalty=args.repeat_penalty,
        repeat_last_n=args.repeat_last_n,
    )
    if args.instruct:
        args.interactive = True
        args.reverse_prompt.append(INSTRUCT_PREFIX.strip())

    ctxman = ContextManager(engine, args.ctx_size, min(n_keep, args.ctx_size // 2))

    if getattr(args, "draft_lookup", False):
        sampled_ok = args.temp <= 0 or args.repeat_penalty == 1.0
        if args.interactive or ring or not sampled_ok:
            print(
                "warning: --draft-lookup requires non-interactive, non-ring, "
                "and repeat-penalty 1.0 when sampling; ignoring",
                file=sys.stderr,
            )
        else:
            from ..runtime.speculative import LookupEngine, SpecConfig

            g = max(1, args.draft_n)
            scfg = SpecConfig(
                n_ctx=args.ctx_size, gamma=g,
                kv_dtype=getattr(args, "kv_dtype", "bfloat16"),
            )
            # no context shift in the speculative engines: clamp the budget
            # to what fits (plain decode keeps ContextManager's shift)
            headroom = scfg.rounds_per_block * g + g + 1
            budget = args.ctx_size - len(prompt_tokens) - headroom
            if budget < 1:
                print(
                    "warning: prompt leaves no room for --draft-lookup "
                    "decoding; falling back to plain decode",
                    file=sys.stderr,
                )
                args.draft_lookup = False
            else:
                if budget < args.n_predict:
                    print(
                        f"warning: --draft-lookup clamps -n to {budget} "
                        "(no context shift in speculative mode)",
                        file=sys.stderr,
                    )
                spec = LookupEngine(cfg, params, scfg)
                out = spec.generate(
                    prompt_tokens, min(args.n_predict, budget),
                    ignore_eos=args.ignore_eos,
                    sp=sp if args.temp > 0 else None,
                    seed=args.seed if args.seed >= 0 else 0,
                )
                text = b"".join(tok.decode_token(t) for t in out)
                stdout.write(text.decode("utf-8", errors="replace"))
                stdout.write("\n")
                print(
                    f"lookup-speculative: {spec.stats['emitted']} tokens in "
                    f"{spec.stats['rounds']} rounds "
                    f"({spec.stats['emitted'] / max(spec.stats['rounds'], 1):.2f} "
                    "tok/round)",
                    file=sys.stderr,
                )
                return 0

    draft = getattr(args, "draft_model", None)
    if draft:
        # speculative decoding: greedy-only, single-shot (the emitted stream
        # IS the main model's greedy stream, so it composes with none of the
        # sampler/interactive features)
        if args.temp > 0 or args.interactive or ring:
            print(
                "warning: --draft-model requires --temp 0, non-interactive, "
                "non-ring; ignoring the draft",
                file=sys.stderr,
            )
        else:
            from ..runtime.speculative import SpecConfig, SpeculativeEngine

            dcfg, dparams, _ = load_model(draft)
            spec = SpeculativeEngine(
                cfg, params, dcfg, dparams,
                SpecConfig(n_ctx=args.ctx_size, gamma=max(1, args.draft_n),
                           kv_dtype=getattr(args, "kv_dtype", "bfloat16")),
            )
            out = spec.generate(
                prompt_tokens, args.n_predict, ignore_eos=args.ignore_eos
            )
            text = b"".join(tok.decode_token(t) for t in out)
            stdout.write(text.decode("utf-8", errors="replace"))
            stdout.write("\n")
            ar = spec.acceptance_rate
            print(
                f"speculative: {spec.stats['emitted']} tokens in "
                f"{spec.stats['rounds']} rounds, acceptance {ar:.0%}",
                file=sys.stderr,
            )
            return 0

    reverse_seqs = [tok.encode(r, bos=False) for r in args.reverse_prompt]
    out_buf = bytearray()

    # SIGINT interject (main.cpp:26-36): during interactive generation the
    # first ^C stops the decode loop (at decode_block granularity) and drops
    # to the input prompt; a second ^C while already interacting exits 130.
    interject = {"flag": False, "waiting": False}
    prev_handler = None

    def _sigint(signo, frame):
        if use_color:
            stdout.write(ANSI_RESET)
        stdout.write("\n")
        stdout.flush()
        if interject["waiting"] or interject["flag"]:
            raise SystemExit(130)
        interject["flag"] = True

    if args.interactive:
        prev_handler = signal.signal(signal.SIGINT, _sigint)

    def stream(t: int) -> bool:
        piece = tok.decode_token(t)
        out_buf.extend(piece)
        stdout.write(piece.decode("utf-8", errors="replace"))
        stdout.flush()
        if interject["flag"]:
            return False
        # antiprompt detection on the token tail
        for rs in reverse_seqs:
            if rs and engine.tokens[-len(rs):] == rs:
                return False
        return True

    # echo the prompt like the reference main (input echo on by default)
    put(
        b"".join(tok.decode_token(t) for t in prompt_tokens).decode(
            "utf-8", errors="replace"
        ),
        ANSI_YELLOW,
    )

    pending = prompt_tokens
    remaining = args.n_predict
    while True:
        if ring:
            n = remaining  # the ring absorbs overflow; no swap, no re-eval
        else:
            ctxman.ensure_room(len(pending) + 1)
            n = min(remaining, args.ctx_size - engine.n_past - len(pending))
        if n <= 0:
            break
        got = engine.generate(
            pending, n, sp, on_token=stream, ignore_eos=args.ignore_eos
        )
        remaining -= len(got)
        ended = (not args.ignore_eos and got and got[-1] == EOS_ID)
        if args.interactive:
            # reference semantics: interactive mode keeps prompting when the
            # budget runs out (n_remain resets, main.cpp:444-448); only stdin
            # EOF ends the session
            if remaining <= 0 or ended:
                remaining = args.n_predict
            interject["flag"] = False
            stdout.write("\n> ")
            if use_color:
                stdout.write(ANSI_BOLD_GREEN)
            stdout.flush()
            interject["waiting"] = True
            try:
                line = stdin.readline()
            finally:
                interject["waiting"] = False
                if use_color:
                    stdout.write(ANSI_RESET)
                    stdout.flush()
            if not line:
                break
            if args.instruct:
                line = INSTRUCT_PREFIX + line.rstrip("\n") + INSTRUCT_SUFFIX
            pending = tok.encode(line, bos=False)
            continue
        break

    if prev_handler is not None:
        signal.signal(signal.SIGINT, prev_handler)
    stdout.write("\n")
    print(engine.timings.report(), file=sys.stderr)
    return 0


def main(argv=None):
    args = build_argparser().parse_args(argv)
    return run(args)


if __name__ == "__main__":
    sys.exit(main())
