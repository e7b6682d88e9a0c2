from xboard_spark.plans.lint import (  # noqa: F401
    assert_filter_on,
    explain_str,
    plan_report,
)
