from .base import (Approximate, IncompatibleSketchError, Sketch, from_bytes,
                   merge_all)
from .bloom import BloomFilter, optimal_num_hashes, optimal_width
from .cms import CMS
from .composite import MultiSketch
from .hll import HLL, bits_for_error
from .kll import KLL, kll_rank_error
from .minhash import MinHash, pick_bands_rows
from .tdigest import TDigest

__all__ = [
    "Approximate", "IncompatibleSketchError", "Sketch", "from_bytes", "merge_all",
    "BloomFilter", "optimal_num_hashes", "optimal_width",
    "CMS", "MultiSketch", "HLL", "bits_for_error", "KLL", "kll_rank_error",
    "MinHash", "pick_bands_rows", "TDigest",
]
