"""The shared AQE-off scope (util.aqe_off): trainer loops scope
spark.sql.adaptive.enabled=false; concurrent/nested scopes must share one
save/restore so a race can never leave AQE off after all scopes exit
(VERDICT r15 #4 / ADVICE r15 classifier.py:157)."""

import threading

from siddhi_io_cdc_spark.util import aqe_off

_KEY = "spark.sql.adaptive.enabled"


def test_aqe_off_restores_prior_value(spark):
    spark.conf.set(_KEY, "true")
    with aqe_off(spark):
        assert spark.conf.get(_KEY) == "false"
    assert spark.conf.get(_KEY) == "true"


def test_aqe_off_nested_scopes_share_one_restore(spark):
    spark.conf.set(_KEY, "true")
    with aqe_off(spark):
        with aqe_off(spark):
            assert spark.conf.get(_KEY) == "false"
        # inner exit must NOT restore while the outer scope is open
        assert spark.conf.get(_KEY) == "false"
    assert spark.conf.get(_KEY) == "true"


def test_aqe_off_concurrent_scopes_cannot_strand_false(spark):
    """Two overlapping scopes on different threads (the old save/restore
    race: B saves 'false' as its prior value and restores it last)."""
    spark.conf.set(_KEY, "true")
    a_entered = threading.Event()
    b_done = threading.Event()
    errs = []

    def scope_b():
        try:
            a_entered.wait(30)
            with aqe_off(spark):
                assert spark.conf.get(_KEY) == "false"
        except Exception as e:  # pragma: no cover - surfaced via errs
            errs.append(e)
        finally:
            b_done.set()

    t = threading.Thread(target=scope_b)
    t.start()
    with aqe_off(spark):
        a_entered.set()
        b_done.wait(30)  # B enters AND exits while A is still open
        assert spark.conf.get(_KEY) == "false"
    t.join(30)
    assert not errs
    assert spark.conf.get(_KEY) == "true"


def test_aqe_off_restores_on_exception(spark):
    spark.conf.set(_KEY, "true")
    try:
        with aqe_off(spark):
            raise RuntimeError("boom")
    except RuntimeError:
        pass
    assert spark.conf.get(_KEY) == "true"
