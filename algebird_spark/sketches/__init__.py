from .base import (Approximate, ApproximateBoolean,
                   IncompatibleSketchError, Sketch, from_bytes,
                   merge_all)
from .bloom import BloomFilter, optimal_num_hashes, optimal_width
from .cms import CMS, cms_params_for_groups
from .composite import MultiSketch
from .eventually import Eventually
from .freqdir import FrequentDirections
from .hll import HLL, bits_for_error
from .kll import KLL, kll_rank_error
from .minhash import MinHash, pick_bands_rows
from .moments import Moments, SetSize
from .qtree import QTree
from .sketchmap import (DecayingCMS, SketchMap, SketchMapHLL,
                        SketchMapSet)
from .spacesaver import SpaceSaver
from .tdigest import TDigest
from .timeseries import DecayedValue, ExpHist, HLLSeries

__all__ = [
    "Approximate", "ApproximateBoolean", "IncompatibleSketchError",
    "Sketch", "from_bytes", "merge_all",
    "BloomFilter", "optimal_num_hashes", "optimal_width",
    "CMS",
    "cms_params_for_groups", "MultiSketch", "Eventually",
    "FrequentDirections",
    "HLL", "bits_for_error", "KLL", "kll_rank_error",
    "MinHash", "pick_bands_rows", "TDigest",
    "Moments", "SetSize", "QTree", "SpaceSaver",
    "DecayedValue", "ExpHist", "HLLSeries", "SketchMap", "SketchMapHLL",
    "SketchMapSet",
    "DecayingCMS",
]
