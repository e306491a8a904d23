from .options import OPTION_TABLE, POSTPROC_TABLE, OptionItem, parse_option_line, load_options_file
