from lvae_tpu.utils.general import (
    ANSI, SimpleTable, MaxLengthList, increment_dir, json_dump, json_load,
    read_file, print_to_file, print_dict_as_table, my_stream_handler,
)
from lvae_tpu.utils import coding
