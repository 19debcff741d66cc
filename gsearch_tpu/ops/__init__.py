from .hash import mix32, mix2, uniform01, exp_from_bits
from .kmer import kmer_windows, canonical_dna_windows
from .race import bucket_min, combine_race
from .distance import hamming_frac, brute_force_knn
