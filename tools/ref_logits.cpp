// Dump the C reference's logits for a given token sequence — the probe side
// of the differential-parity suite (tests/test_reference_parity.py).
//
// Usage: ref_logits MODEL N_CTX TOK0 TOK1 ...   (writes [T, n_vocab] f32 LE
// to stdout; evaluates all tokens in one batch with logits_all, mirroring
// our llama_forward(logits_all=True)).
//
// Built by tools/build_reference.sh against the scalar reference objects in
// .refbuild/ (llama.o, ggml.o).
#include "llama.h"

#include <cstdio>
#include <cstdlib>
#include <vector>

int main(int argc, char ** argv) {
    if (argc < 4) {
        fprintf(stderr, "usage: %s MODEL N_CTX TOK...\n", argv[0]);
        return 1;
    }
    llama_context_params p = llama_context_default_params();
    p.n_ctx = atoi(argv[2]);
    p.seed = 1;
    p.f16_kv = false;   // --memory_f32: the oracle configuration
    p.logits_all = true;
    llama_context * ctx = llama_init_from_file(argv[1], p);
    if (!ctx) return 2;
    std::vector<llama_token> toks;
    for (int i = 3; i < argc; i++) toks.push_back(atoi(argv[i]));
    if (llama_eval(ctx, toks.data(), (int) toks.size(), 0, 1)) return 3;
    const float * lg = llama_get_logits(ctx);
    const int nv = llama_n_vocab(ctx);
    fwrite(lg, sizeof(float), (size_t) nv * toks.size(), stdout);
    return 0;
}
