from . import (dedup, multimodal, packing, pipeline, sampling,  # noqa: F401
               similarity, temporal, text)
