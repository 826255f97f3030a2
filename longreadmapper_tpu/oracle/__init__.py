from .refpipe import OracleMapper, OracleResult

__all__ = ["OracleMapper", "OracleResult"]
