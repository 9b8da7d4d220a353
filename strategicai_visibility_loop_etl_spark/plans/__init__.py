from .corpus import default_corpus_config, run_corpus_pipeline
from .pipeline import default_config, run_visibility_pipeline

__all__ = [
    "default_config",
    "default_corpus_config",
    "run_corpus_pipeline",
    "run_visibility_pipeline",
]
