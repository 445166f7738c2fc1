from .reference_oracle import extract_document, extract_page, strip_text_span  # noqa: F401
