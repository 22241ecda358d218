from multimodal_vector_db_spark.functions import text, vector  # noqa: F401
