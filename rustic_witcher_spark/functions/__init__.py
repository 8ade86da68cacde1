from rustic_witcher_spark.functions import fake, fake_sql, hashing, wordlists

__all__ = ["fake", "fake_sql", "hashing", "wordlists"]
