"""LLM-data-pipeline operators (SURVEY.md §2.9, BASELINE.json north star):
deduplication, similarity search, text analysis, quality filtering,
multimodal columns — each designed for the 100 TB corpus case.

dedup       — L1 exact, L2 near-dup (MinHash+LSH, SimHash, n-gram Jaccard,
              embedding cosine)
similarity  — L3 top-k neighbor search (exact brute-force baseline +
              LSH-bucketed scale path)
multimodal  — L5 binary media columns with typed metadata + decode plumbing
Text analysis (L4) primitives live in functions/text.py; quality filtering
(L6) is a filter over those features (queries/llm_suite.py).
"""

from .dedup import (
    exact_dedup_groups,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_near_dup_pairs,
    simhash_near_dup_pairs,
    simhash_signature,
)
from .components import connected_components, dedup_keep_canonical
from .similarity import ivf_topk, lsh_topk, topk_bruteforce

__all__ = [
    "exact_dedup_groups",
    "jaccard_pairs",
    "minhash_lsh_candidates",
    "minhash_near_dup_pairs",
    "simhash_signature",
    "simhash_near_dup_pairs",
    "topk_bruteforce",
    "lsh_topk",
    "ivf_topk",
    "connected_components",
    "dedup_keep_canonical",
]
