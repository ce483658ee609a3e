from .generator import CdcLogGenerator, FIXTURE_TABLES
from .oracle import replay_dml

__all__ = ["CdcLogGenerator", "FIXTURE_TABLES", "replay_dml"]
