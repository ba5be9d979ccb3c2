"""GPTQ-for-LLaMA 4-bit .pt checkpoint → GGJT Q4_1.

Behavioral port of convert-gptq-to-ggml.py: per-row GPTQ tensors
(qweight int32 [K/8, N] with 8 nibbles per word, scales [N], zeros [N]) become
Q4_1 blocks with d = scale and m = -zeros repeated across each row's blocks
(that GPTQ variant stores zeros pre-multiplied by scale, hence the direct
sign flip). wq/wk rows are unpermuted from the HF rotate-half order, and the
output file uses aligned GGJT v1 (the reference wrote ggmf v1).
"""

from __future__ import annotations

import re
import sys

import numpy as np

from ..formats.ggml_io import CheckpointWriter, Hparams
from ..formats.q4 import GGML_FTYPE_F16, GGML_FTYPE_F32, GGML_FTYPE_Q4_1, QK, q4_1_to_bytes
from .hf import _map_name, _unpermute_qk
from .spm_reader import read_spm_vocab


def _unpack_qweight(qweight: np.ndarray) -> np.ndarray:
    """int32 [K/8, N] → uint8 nibbles [N, K] (low nibble first within a word)."""
    kw, n = qweight.shape
    w = qweight.astype(np.uint32).T  # [N, K/8]
    nibbles = np.empty((n, kw * 8), np.uint8)
    for j in range(8):
        nibbles[:, j::8] = ((w >> (4 * j)) & 0xF).astype(np.uint8)
    return nibbles


def convert_gptq(
    model_path: str, tokenizer_path: str, out_path: str, n_head: int | None = None
) -> str:
    import torch

    model = torch.load(model_path, map_location="cpu", weights_only=True)
    vocab = read_spm_vocab(tokenizer_path)
    n_vocab, n_embd = model["model.embed_tokens.weight"].shape
    n_layer = 1 + max(
        int(m.group(1))
        for name in model
        if (m := re.match(r"model\.layers\.([0-9]+)", name))
    )
    if n_head is None:
        # the LLaMA family table (reference hardcodes the same mapping)
        n_head = {32: 32, 40: 40, 60: 52, 80: 64}.get(n_layer, n_embd // 128)
    assert len(vocab) == n_vocab
    hp = Hparams(
        n_vocab=n_vocab, n_embd=n_embd, n_mult=256, n_head=n_head,
        n_layer=n_layer, n_rot=n_embd // n_head, ftype=GGML_FTYPE_Q4_1,
    )

    with CheckpointWriter(out_path, hp, vocab) as w:

        def write_dense(src: str):
            dst = _map_name(src)
            v = model[src]
            if v.ndim == 1:
                v = v.to(torch.float32)
            arr = v.numpy()
            ft = GGML_FTYPE_F16 if arr.dtype == np.float16 else GGML_FTYPE_F32
            w.write_array(dst, arr, ft)

        def write_q4(src: str, permute: bool = False):
            dst = _map_name(src + ".weight")
            zeros = np.asarray(model[f"{src}.zeros"].numpy(), np.float32).reshape(-1)
            scales = np.asarray(model[f"{src}.scales"].numpy(), np.float32).reshape(-1)
            if f"{src}.bias" in model:
                assert not np.any(model[f"{src}.bias"].numpy()), "Q4_1 has no bias"
            q = _unpack_qweight(model[f"{src}.qweight"].numpy())  # [N, K]
            n, k = q.shape
            g = k // QK
            d = np.repeat(scales[:, None], g, axis=1)  # [N, G]
            m = np.repeat(-zeros[:, None], g, axis=1)
            if permute:
                d_, m_, q_ = (
                    _unpermute_qk(a, n_head) for a in (d, m, q)
                )
                d, m, q = d_, m_, q_
            blob = q4_1_to_bytes(d, m, q.reshape(n, g, QK))
            w.write_tensor(dst, (k, n), GGML_FTYPE_Q4_1, blob)
            print(f"  {src}: ({n}, {k}) q4_1", file=sys.stderr)

        write_dense("model.embed_tokens.weight")
        write_dense("model.norm.weight")
        write_dense("lm_head.weight")
        for i in range(n_layer):
            p = f"model.layers.{i}."
            write_q4(p + "self_attn.q_proj", permute=True)
            write_q4(p + "self_attn.k_proj", permute=True)
            write_q4(p + "self_attn.v_proj")
            write_q4(p + "self_attn.o_proj")
            write_q4(p + "mlp.gate_proj")
            write_q4(p + "mlp.down_proj")
            write_q4(p + "mlp.up_proj")
            write_dense(p + "input_layernorm.weight")
            write_dense(p + "post_attention_layernorm.weight")
    return out_path


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if len(argv) != 3:
        print("usage: gptq.py model-4bit.pt tokenizer.model out.bin", file=sys.stderr)
        return 1
    print(convert_gptq(*argv))
    return 0


if __name__ == "__main__":
    sys.exit(main())
