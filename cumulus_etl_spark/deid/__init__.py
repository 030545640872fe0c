from cumulus_etl_spark.deid.codebook import Codebook
from cumulus_etl_spark.deid.scrubber import Scrubber

__all__ = ["Codebook", "Scrubber"]
