"""spark-submit application file.

``spark-submit`` takes a script, not ``-m``, so this thin shim forwards to
the package CLI (parconnect_spark/__main__.py) which the
``--py-files parconnect_spark.zip`` artifact supplies::

    spark-submit --master <cluster> \
        --py-files dist/parconnect_spark.zip \
        launch.py --input kronecker --scale 20

Everything after ``launch.py`` is the package CLI's argv.
"""

import sys

from parconnect_spark.__main__ import main

if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
