"""ai4orgwebscraper_spark — a PySpark-native URL-frontier + analytics engine.

A brand-new, Spark-first engine with the query and data-processing
capabilities of the reference scraper (OnlineGBC/ai4orgWebScraper,
surveyed in SURVEY.md). Not a port: the reference's sequential
requests/BeautifulSoup loop (reference: app_wrapper.py:165-168) is
re-expressed as iterative DataFrame rounds — politeness-scheduled
frontier selection, vectorized Arrow fetch+parse, bloom-prefiltered
seen-set anti-joins — designed for 10^10-URL scale while reproducing
the reference's observable behavior (crawl order, URL-seen set,
interleaved span sequences) exactly.
"""

__version__ = "0.1.0"
