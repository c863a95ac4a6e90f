from .filter import parse_filter, Filter, FilterError
