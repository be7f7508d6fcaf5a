from .download import DATASETS, dataset_urls, download_data  # noqa: F401
from .plot import (juxtapose, plot_evaluation_results_segments,  # noqa: F401
                   plot_partition_metrics)
