from shaman_scraping_spark.cli import main

raise SystemExit(main())
