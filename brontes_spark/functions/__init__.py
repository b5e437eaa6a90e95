from .decimals import DEC, DEC9, dec, dec9, to_dbl
from .hashing import md5_long, md5_bit
from .text import ws_tokens, word_ngrams, norm_text

__all__ = [
    "DEC",
    "DEC9",
    "dec",
    "dec9",
    "to_dbl",
    "md5_long",
    "md5_bit",
    "ws_tokens",
    "word_ngrams",
    "norm_text",
]
