from .ragged import Ragged, pad_rows, rows_to_flat, flat_gather_lens
