from .field import FP, FR, Field  # noqa: F401
from . import limbs  # noqa: F401
