from .logging import get_logger
from .rng import key_from_seed, split_key
from .io import dump_json, load_json

__all__ = ["get_logger", "key_from_seed", "split_key", "dump_json", "load_json"]
