#ifndef GM_STUB_BOOST_VECTOR
#define GM_STUB_BOOST_VECTOR
#include <vector>
#include <boost/archive/binary_oarchive.hpp>
#endif
