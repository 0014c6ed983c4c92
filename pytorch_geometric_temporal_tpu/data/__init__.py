from .chickenpox import ChickenpoxDatasetLoader
from .encovid import EnglandCovidDatasetLoader
from .metr_la import METRLADatasetLoader
from .montevideo_bus import MontevideoBusDatasetLoader
from .mtm import MTMDatasetLoader
from .pedalme import PedalMeDatasetLoader
from .pems import PemsAllLADatasetLoader, PemsDatasetLoader
from .pems_bay import PemsBayDatasetLoader
from .synthetic_pde import (
    AdvectionDiffusionDatasetLoader,
    SIDiffusionDatasetLoader,
    WaveEquationDatasetLoader,
)
from .twitter_tennis import TwitterTennisDatasetLoader
from .wikimath import WikiMathsDatasetLoader
from .windmill import (
    WindmillOutputLargeDatasetLoader,
    WindmillOutputMediumDatasetLoader,
    WindmillOutputSmallDatasetLoader,
)

__all__ = [
    "ChickenpoxDatasetLoader",
    "EnglandCovidDatasetLoader",
    "METRLADatasetLoader",
    "MontevideoBusDatasetLoader",
    "MTMDatasetLoader",
    "PedalMeDatasetLoader",
    "PemsAllLADatasetLoader",
    "PemsDatasetLoader",
    "PemsBayDatasetLoader",
    "AdvectionDiffusionDatasetLoader",
    "SIDiffusionDatasetLoader",
    "WaveEquationDatasetLoader",
    "TwitterTennisDatasetLoader",
    "WikiMathsDatasetLoader",
    "WindmillOutputLargeDatasetLoader",
    "WindmillOutputMediumDatasetLoader",
    "WindmillOutputSmallDatasetLoader",
]
