from . import classify, lda, pairs, tfidf  # noqa: F401
