"""Generate a NEAR-identical whale corpus for the dedup skew soak.

The round-9 whale soaks used byte-identical duplicate groups, which the
exact-duplicate / signature collapses now merge to one representative —
so the hot band bucket never reaches the banded join. This corpus is
the adversarial follow-up (VERDICT r09 item 4): one near-dup cluster of
``whale_n`` documents built from shared boilerplate plus one unique
noise token each. Every text (and in most cases every minhash
signature) is DISTINCT, so the collapse cannot merge them, yet the
cluster still shares most minhash band keys and almost all ngram
shingles — the banded/posting joins see a genuinely hot bucket whose
pair OUTPUT is the C(whale_n, 2) contract.

Usage::

    python tools/make_whale_neardup.py /tmp/whale_nd 10500 24500
    python tools/make_whale_neardup.py /tmp/whale_nd2 21000 49000
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BOILER = (
    "the shipment manifest lists every container identifier together with "
    "its declared weight and the customs tariff code assigned at the port "
    "of origin while the receiving agent confirms the seal number and "
    "records the arrival timestamp in the terminal ledger for audit"
).split()  # 45 tokens -> 43 trigram shingles


def letters(n: int) -> str:
    """Base-26 letters-only encoding — tokens must stay unique under
    BOTH tokenizers in play (whitespace in functions/text.py AND the
    ``[^a-z]+`` split inside jaccard_prefix_join, which erases digits;
    a digit-bearing token like 'nz7' degrades to 'nz' there and
    near-dup docs silently become exact duplicates)."""
    s = ""
    n += 1
    while n:
        n, r = divmod(n - 1, 26)
        s = chr(ord("a") + r) + s
    return s


def main() -> None:
    out_dir, whale_n, tail_n = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
    )
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(42)

    texts: list[str] = []
    # whale cluster: boilerplate with ONE token replaced by a unique
    # noise token at a rotating position — pairwise shingle Jaccard
    # ~(43-6)/(43+6) ≈ 0.76, comfortably above the 0.5 thresholds, so
    # the full C(whale_n,2) pair set IS the contract output
    for i in range(whale_n):
        ws = list(BOILER)
        ws[5 + (i % 30)] = "nz" + letters(i)
        texts.append(" ".join(ws))
    # distinct tail: letters-only unique vocabulary per doc, so no two
    # tail docs share a shingle under either tokenizer
    for i in range(tail_n):
        toks = [
            "w" + letters(int(rng.integers(0, 50_000))) for _ in range(30)
        ]
        texts.append(
            "tail document " + letters(i) + " " + " ".join(toks)
        )

    n = len(texts)
    table = pa.table(
        {
            "doc_id": pa.array(range(n), pa.int64()),
            "text": pa.array(texts, pa.string()),
            "source": pa.array(["whale" if i < whale_n else "tail" for i in range(n)]),
            "lang": pa.array(["en"] * n),
        }
    )
    pq.write_table(table, os.path.join(out_dir, "documents.parquet"))
    print(f"wrote {n} docs ({whale_n} near-dup whale) -> {out_dir}")


if __name__ == "__main__":
    main()
