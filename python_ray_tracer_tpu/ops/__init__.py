# Import order matters: the compat shim must register its Mosaic lowering
# rules before any kernel in this package is compiled.
from . import pallas_compat  # noqa: F401
