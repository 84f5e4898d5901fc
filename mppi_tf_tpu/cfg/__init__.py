from .config import (parse_config, parse_dir, default_config, load_config,
                     patch_config)

__all__ = ["parse_config", "parse_dir", "default_config", "load_config",
           "patch_config"]
