from .twobit import (
    NUMBER_BASE_LUT,
    NUMBER_ARROW_LUT,
    LOWER_LUT,
    UPPER_LUT,
    ARROW_LETTER_LUT,
    compressed_len,
    pack_2bit_np,
    unpack_2bit_np,
    pack_2bit,
    unpack_2bit,
)
