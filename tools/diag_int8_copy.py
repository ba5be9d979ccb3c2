"""One-off probe: identify the bf16[32,344,4096] copy in the int8-KV B=1
decode program (tools/diag_int8_b1.py found it; ROADMAP item 0).

Compiles the same 64-step decode scan with int8 KV and prints every HLO line
mentioning the suspect shape plus the copy-start producer/consumer chain.
"""

import re
import sys
from functools import partial

import jax
import jax.numpy as jnp

from llamavk_tpu.models import LLAMA_CONFIGS, ModelConfig, init_kv_cache, synthetic_params
from llamavk_tpu.models.llama import llama_forward


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    jax.config.update("jax_platforms", "cpu")  # compile-only probe: CPU? no —
    # layout-driven copies are backend-specific; stay on the TPU backend.
    jax.config.update("jax_platforms", "")
    batch, n_ctx, steps = 1, 512, 64
    cfg = ModelConfig(**LLAMA_CONFIGS["7B"])
    params = synthetic_params(cfg, seed=0)
    cache = init_kv_cache(cfg, batch, n_ctx, dtype=jnp.int8)

    @partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(2,))
    def decode(params, tok0, cache, n_past0, n_steps):
        def body(state, i):
            tok, cache = state
            logits, cache, _ = llama_forward(
                params, tok.reshape(batch, 1), cache, n_past0 + i, cfg
            )
            nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
            return (nxt, cache), nxt

        (_, cache), toks = jax.lax.scan(
            body, (tok0, cache), jnp.arange(n_steps, dtype=jnp.int32)
        )
        return toks, cache

    tok0 = jnp.zeros((batch,), jnp.int32)
    lowered = decode.lower(params, tok0, cache, jnp.int32(steps), steps)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    pat = sys.argv[1] if len(sys.argv) > 1 else "344,4096"
    lines = hlo.splitlines()
    hits = [i for i, l in enumerate(lines) if pat in l]
    log(f"{len(hits)} HLO lines mention {pat!r}:")
    for i in hits:
        log(f"  L{i}: {lines[i].strip()[:400]}")
    # find copy-start lines and their operand names; then where the operand
    # is defined and where the copy-done result is used
    for i in hits:
        l = lines[i]
        m = re.search(r"(%?[\w.-]+) = .*copy-start\(([^)]*)\)", l)
        if not m:
            continue
        name, ops = m.groups()
        log(f"\ncopy-start {name} operand(s): {ops}")
        opname = ops.split(",")[0].strip().split(" ")[-1]
        for j, l2 in enumerate(lines):
            if re.search(rf"\b{re.escape(opname.lstrip('%'))} = ", l2):
                log(f"  producer L{j}: {l2.strip()[:400]}")
    sys.stdout.write("done\n")


if __name__ == "__main__":
    main()
