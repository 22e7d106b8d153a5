"""``python -m exceldatatransform_py_spark`` — see cli.py."""

from exceldatatransform_py_spark.cli import main

if __name__ == "__main__":
    main()
