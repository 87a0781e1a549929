from .medallion import run_medallion  # noqa: F401
from .pipeline import Pipeline, Stage  # noqa: F401
