from .aggregates import AGGREGATORS, AggCtx, ordered_list  # noqa: F401
