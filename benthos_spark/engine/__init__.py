"""Pipeline engine: YAML spec -> processor kernels + Spark plan compiler."""

from .processors import (  # noqa: F401
    Env,
    MemoryCache,
    Part,
    Processor,
    Resources,
    build_processor,
    execute_all,
)
from .conditions import Condition, build_condition  # noqa: F401
from . import processors_ext  # noqa: F401  (extends the processor registry)
