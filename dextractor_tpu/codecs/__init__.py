from .twobit_codec import (
    encode_fasta_to_dexta,
    decode_dexta_to_fasta,
    encode_arrow_to_dexar,
    decode_dexar_to_arrow,
)
