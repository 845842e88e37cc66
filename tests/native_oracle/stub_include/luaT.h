// luaT.h stub for the oracle build (real lua API is stubbed in oracle.cpp).
#pragma once
