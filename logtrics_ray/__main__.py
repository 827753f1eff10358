import sys

from logtrics_ray.cli import main

sys.exit(main())
