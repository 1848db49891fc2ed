from entitymatch_spark.sources.synthetic import (  # noqa: F401
    CorpusFixture,
    corpus_to_spark,
    generate_corpus,
)
