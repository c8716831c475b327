"""Measure BPE merge-loop scaling at production depth (round-8 verdict
item 5): real tokenizers run ~30k merges over 100k+ word heads, far
past the registered fixture depth (24). This probes the driver loop at
n_merges = 1k / 8k / 32k on a deterministic 100k-word Zipf dictionary
— the incremental delta+heap form (`_bpe_merge_loop`, shipped) against
the textbook full-recount reference (`_bpe_merge_loop_reference`,
parity twin), which tests/test_bpe_fidelity.py pins bit-identical.

The reference loop is O(n_merges × Σ|word|) and is only timed at the
shallowest depth (its 32k extrapolation is hours); the incremental
loop touches exactly the words containing each merged pair, so its
per-merge cost FALLS as merges specialize down the Zipf tail.

Results are recorded in SCALE.md ("BPE at production depth"). Run:
python tools/bpe_probe.py [n_words]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gomapreduce_spark.operators.text import _bpe_merge_loop, _bpe_merge_loop_reference


def zipf_dict(vocab: int) -> list[tuple[str, int]]:
    """Deterministic heavy-tail dictionary: word i spelled in base-26
    over 'a'..'z' (injective, so length grows log-ly like real words),
    frequency max(1, vocab // i) — the test_bpe_fidelity generator
    scaled up."""
    alpha = "abcdefghijklmnopqrstuvwxyz"

    def word(i: int) -> str:
        out = []
        while True:
            out.append(alpha[i % 26])
            i //= 26
            if not i:
                return "".join(out)

    freqs = [(word(i), max(1, vocab // i)) for i in range(1, vocab + 1)]
    assert len({w for w, _ in freqs}) == vocab
    return sorted(freqs, key=lambda kv: (-kv[1], kv[0]))


def main() -> int:
    vocab = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    freqs = zipf_dict(vocab)
    total_syms = sum(len(w) + 1 for w, _ in freqs)
    print(f"dict: {vocab} words, {total_syms} symbols")

    rows = []
    for depth in (1_000, 8_000, 32_000):
        t0 = time.time()
        m = _bpe_merge_loop(list(freqs), depth)
        dt = time.time() - t0
        rows.append(("incremental", depth, dt, len(m)))
        print(f"incremental n_merges={depth:>6}: {dt:8.2f}s ({len(m)} merges)")

    # reference loop at the shallowest depth only (O(depth × symbols))
    t0 = time.time()
    m = _bpe_merge_loop_reference(list(freqs), 1_000)
    dt = time.time() - t0
    rows.append(("reference", 1_000, dt, len(m)))
    print(f"reference   n_merges=  1000: {dt:8.2f}s ({len(m)} merges)")
    per_merge = dt / 1_000
    print(f"reference extrapolation: 32k merges ≈ {per_merge * 32_000 / 60:.0f} min "
          f"(lower bound — its per-merge cost is flat in depth)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
