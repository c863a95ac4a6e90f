from .paths import path_to, root, catenate, numbered_suffix
from .args import ArgSpec, parse_flags
from .errors import DextractorError
