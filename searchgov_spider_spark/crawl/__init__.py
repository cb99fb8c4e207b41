from .engine import CrawlEngine, CrawlRun  # noqa: F401
from .reference_bfs import CrawlPolicy, reference_crawl  # noqa: F401
