"""Large-scale training-data pipeline operators.

These extend the reference's operator core (SURVEY.md §7.1 step 8) with the
operations a 100 TB LLM-data pipeline needs: deduplication (exact, MinHash
LSH, SimHash, n-gram Jaccard, embedding-cosine), similarity search
(brute-force + LSH-bucketed ANN), text analysis (language-ID, quality,
tokens, fingerprints), and multimodal binary-column plumbing.

Design rule: everything is built from JVM-side built-ins (split/transform/
aggregate/md5/window) so plans stay inside whole-stage codegen; Pandas UDFs
appear only where per-row Python is genuinely required (multimodal decode).
Cross-engine determinism (for the DuckDB oracle) comes from md5-based
hashing and integer-quantized vector math — no engine-private hash
functions, no float accumulation ambiguity.
"""

from .dedup import (
    exact_dedup,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from .similarity import brute_force_topk, lsh_bucket_topk, quantize_embeddings
from .text import fingerprint, language_id, quality_score, token_stats

__all__ = [
    "exact_dedup",
    "minhash_signatures",
    "minhash_lsh_pairs",
    "ngram_jaccard_pairs",
    "simhash",
    "quantize_embeddings",
    "brute_force_topk",
    "lsh_bucket_topk",
    "token_stats",
    "language_id",
    "quality_score",
    "fingerprint",
]
