from shaman_scraping_spark.corpus.generator import CorpusSpec, generate_corpus  # noqa: F401
