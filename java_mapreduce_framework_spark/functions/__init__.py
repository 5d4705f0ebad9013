from .text import TOKENS_SQL_DUCKDB, tokens_col, words_exploded
from .vectors import cosine_similarity, l2_norm, vec_dot

__all__ = [
    "TOKENS_SQL_DUCKDB",
    "tokens_col",
    "words_exploded",
    "cosine_similarity",
    "l2_norm",
    "vec_dot",
]
