from ondine_spark.config.loader import load_config, spec_from_dict

__all__ = ["load_config", "spec_from_dict"]
