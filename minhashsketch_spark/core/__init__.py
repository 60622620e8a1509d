from .rng import MT19937, uniform_int, generate_hashes_b, generate_hashes_ab, MERSENNE_P
from .sketch import gen_sig, compute_sim, compute_sim_row, bottom_m_distinct, r_merge, UINT64_MAX
from .kmer import window_words, BASE_LUT
from .fasta import fasta_to_string
