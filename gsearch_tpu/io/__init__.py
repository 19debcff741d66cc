from .codec import (
    DNA_INVALID,
    encode_dna,
    encode_aa,
    decode_dna,
    AA_ALPHABET,
)
from .fasta import FastaRecord, parse_fasta, concat_file_codes, file_records_codes
from .walk import is_fasta_dna_file, is_fasta_aa_file, walk_fasta_dir
