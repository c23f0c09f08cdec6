# Native runtime components (built on demand by robo_vln_tpu/sim/build.py;
# this Makefile is the explicit equivalent).
CXX ?= g++
CXXFLAGS ?= -O3 -march=native -shared -fPIC -std=c++17
SIM := robo_vln_tpu/sim

LIBS := $(SIM)/libtrajstore.so $(SIM)/libkinematics.so $(SIM)/libdtw.so

all: $(LIBS)

$(SIM)/lib%.so: $(SIM)/%.cc
	$(CXX) $(CXXFLAGS) $< -o $@

test: all
	python -m pytest tests/ -q

bench: all
	python bench.py

clean:
	rm -f $(SIM)/*.so

.PHONY: all test bench clean
