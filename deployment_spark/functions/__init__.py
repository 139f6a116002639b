from deployment_spark.functions.text import (
    combined_text,
    packet_text_v1,
    packet_text_v2,
    sanitize_name,
    token_at,
    tokens,
    word_shingles,
)
from deployment_spark.functions.vector import (
    cosine_similarity,
    dot_product,
    l2_norm,
    l2_normalize,
    similarity_from_l2,
)
from deployment_spark.functions.embed import hash_embed

__all__ = [
    "combined_text",
    "packet_text_v1",
    "packet_text_v2",
    "sanitize_name",
    "token_at",
    "tokens",
    "word_shingles",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "l2_normalize",
    "similarity_from_l2",
    "hash_embed",
]
