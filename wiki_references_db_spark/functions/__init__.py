"""Scalar functions and the wikitext normalizer/extractor UDF layer."""
