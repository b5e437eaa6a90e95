from .asof import asof_join
from .windows import grid_downsample, rank_by_group, keep_largest, window_dedup
from .accounting import delta_accounting
from .vwap import expanding_vwap
from .dedup import exact_dedup, ngram_jaccard_pairs, minhash_lsh_pairs, simhash
from .similarity import cosine_topk, lsh_buckets

__all__ = [
    "asof_join",
    "grid_downsample",
    "rank_by_group",
    "keep_largest",
    "window_dedup",
    "delta_accounting",
    "expanding_vwap",
    "exact_dedup",
    "ngram_jaccard_pairs",
    "minhash_lsh_pairs",
    "simhash",
    "cosine_topk",
    "lsh_buckets",
]
