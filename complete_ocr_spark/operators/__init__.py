from .extract import extract_media_udf, strip_text_udf  # noqa: F401
