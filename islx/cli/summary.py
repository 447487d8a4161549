"""Model summary CLI (reference model_param.py / ISL_model_params.py).

    python -m islx.cli.summary body25|coco|hand
"""
from islx.utils.summary import main

if __name__ == "__main__":
    main()
