from .pipeline import run_visibility_pipeline, default_config

__all__ = ["run_visibility_pipeline", "default_config"]
