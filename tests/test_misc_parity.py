"""Small parity surfaces: granule dates, alias package, data entry point."""

import pandas as pd


def test_granule_date_maiac_convention():
    from plumekit.io.dates import granule_date

    # day 255 of 2017 = 2017-09-12 (reference parses %Y%j)
    assert granule_date("MCD19A2.A2017255.h12v09.006.2018119143112.hdf") == \
        pd.Timestamp("2017-09-12")
    assert granule_date("SYNTH.00000001.npz", default="x") == "x"


def test_alias_package():
    import kcl_ltss_bioatm_tpu as alias
    import plumekit

    assert alias.__version__ == plumekit.__version__
    assert alias.ops is plumekit.ops
    assert alias.identify is plumekit.identify


def test_data_entry_point(tmp_path):
    from plumekit.data import make_dataset

    rc = make_dataset.main(["--root", str(tmp_path), "--n-granules", "1",
                            "--size", "64", "--plumes", "1"])
    assert rc == 0
    assert list((tmp_path / "raw/plume_identification/maiac").glob("*.npz"))
