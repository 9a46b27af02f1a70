from alphazero_general_tpu.utils.config import (  # noqa: F401
    Args,
    DEFAULT_ARGS,
    get_args,
    load_args_file,
    save_args_file,
)
from alphazero_general_tpu.utils.misc import (  # noqa: F401
    AverageMeter,
    const_temp_scaling,
    default_temp_scaling,
    get_iter_file,
    map_value,
    scale_temp,
)
