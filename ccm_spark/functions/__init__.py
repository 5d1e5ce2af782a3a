from ccm_spark.functions.hashing import md5_long, sql_md5_long, tokens_col, sql_tokens

__all__ = ["md5_long", "sql_md5_long", "tokens_col", "sql_tokens"]
