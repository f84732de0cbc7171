from .blake2s_jax import (
    hash_elements_rows, merge_pairs, blake2s_words, felt_rows_to_words,
    digests_to_bytes,
)
