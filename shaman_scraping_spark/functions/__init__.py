from shaman_scraping_spark.functions.url import (  # noqa: F401
    canonicalize_url,
    url_hash,
    url_host,
    with_url_columns,
)
from shaman_scraping_spark.functions.html import (  # noqa: F401
    extract_text_udf,
    extract_links_udf,
    redirect_target_udf,
)
from shaman_scraping_spark.functions.text import (  # noqa: F401
    doc_fingerprint,
    lang_id,
    quality_features,
    token_count,
)
