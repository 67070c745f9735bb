"""Shared utilities: config, logging, timing, data I/O.

Parity with the reference's wave_utils module (wave_utils/include/wave/utils/
utils.hpp umbrella): ConfigParser -> :mod:`config`, LOG_* macros ->
:mod:`log`, tic/toc -> :mod:`timing`, csv/matrix I/O -> :mod:`io`.
"""

from libwave_tpu.utils.config import (  # noqa: F401
    ConfigError,
    config_field,
    load_config,
    validate,
)
from libwave_tpu.utils.log import log_error, log_info, log_warn  # noqa: F401
from libwave_tpu.utils.timing import Timer, tic, toc  # noqa: F401
from libwave_tpu.utils.io import (  # noqa: F401
    csv2mat,
    csvcols,
    csvrows,
    mat2csv,
    matrix_from_string,
)
from libwave_tpu.utils.angles import wrap_to_pi, wrap_to_two_pi  # noqa: F401
from libwave_tpu.utils.file import (  # noqa: F401
    dir_exists,
    file_exists,
    path_split,
    paths_combine,
    remove_dir,
)
from libwave_tpu.utils.precision import f32_matmuls  # noqa: F401
from libwave_tpu.utils.checkpoint import (  # noqa: F401
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    solve_with_checkpoints,
)
