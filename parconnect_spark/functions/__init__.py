from parconnect_spark.functions.hashing import wang_hash, wang_unhash, permute_ids

__all__ = ["wang_hash", "wang_unhash", "permute_ids"]
